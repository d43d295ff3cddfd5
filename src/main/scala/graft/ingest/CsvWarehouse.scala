package graft.ingest

import graft.ledger.LedgerStore
import graft.model.UploadStatus
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's "actual CSV processing" extension point made real
  * (reference main.py:129-130: "Add your actual CSV processing logic
  * here"; README.md:159-163: "transform data… connect to a data
  * warehouse"): load the rows of every `done` upload into columnar
  * warehouse tables.
  *
  * CSV is schema-per-upload (SURVEY.md §1.3), so uploads are grouped by
  * their header signature and each group becomes one warehouse table
  * (`<dir>/t_<headerhash>/`), partitioned by `_upload_id`. Loading is
  * idempotent: dynamic partition overwrite replaces exactly the partitions
  * of the uploads being (re)loaded, so re-running after a crash or re-load
  * of a fixed file cannot duplicate rows — the same exactly-once-effect
  * contract as the ledger (ST4).
  *
  * Scale: the per-upload header probe is ONE distributed first-line pass
  * (executors read only the leading bytes of each file — the path list
  * transiting the driver is bounded by upload count, the same magnitude
  * as the ledger read); the data load is Spark's parallel CSV scan per
  * table group; partitioning by upload keeps re-loads and per-upload
  * deletes (GDPR-style) partition-local.
  *
  * `inferTypes = true` opts into per-table schema inference (the
  * reference's "transform data… connect to a data warehouse" roadmap,
  * README.md:159-163): each header group's columns are inferred over the
  * whole group in one extra scan, so a numeric CSV column lands in parquet
  * as a numeric type and downstream aggregation is typed. Inference is per
  * header-group — uploads in one group re-infer TOGETHER on every load, so
  * a group's parquet schema stays consistent across re-loads. Default off:
  * schema-per-upload stays dynamic/stringly, matching the reference's
  * schema-agnostic treatment.
  */
class CsvWarehouse(spark: SparkSession, warehouseDir: String,
    inferTypes: Boolean = false) {

  /** Load all `done` uploads from the ledger into warehouse tables.
    * Returns (tables touched, rows written).
    */
  def loadDone(store: LedgerStore): (Long, Long) = {
    import spark.implicits._
    val done = store.read()
      .filter(col("status") === UploadStatus.Done)
      .select(col("upload_id"),
        concat(col("bucket_name"), lit("/"), col("file_name")).as("path"))
      .as[(String, String)].collect() // bounded by upload count
    // Header probe as ONE distributed pass: each task reads just the first
    // line of its files (executors open the stream directly — at millions
    // of done uploads a serial driver-side loop would be the bottleneck;
    // the path list itself is bounded by upload count, the same magnitude
    // the ledger read already materializes).
    //
    // A source file deleted after ingest (inbox cleanup, GDPR delete) must
    // degrade to skipping THAT upload, not abort the whole warehouse load —
    // the same contract IngestPipeline keeps for its fetch path. The probe
    // is the header read itself; `ignoreMissingFiles` below covers the
    // remaining probe-to-scan window.
    val slices = math.max(1,
      math.min(done.length, spark.sparkContext.defaultParallelism * 4))
    val probed = spark.sparkContext.parallelize(done.toSeq, slices)
      .map { case (id, path) =>
        (CsvWarehouse.headerSignatureOf(path), id, path)
      }
      .collect()
    val missingIds = probed.collect { case (None, id, path) =>
      System.err.println(s"[warehouse] skipping missing upload $id: $path")
      id
    }.toSet
    val byHeader = probed
      .collect { case (Some(sig), id, p) => (sig, id, p) }
      .groupBy(_._1)
      .view.mapValues(_.map { case (_, id, p) => (id, p) }.toSeq).toMap

    var tables = 0L
    var rows = 0L
    byHeader.foreach { case (sig, uploads) =>
      // re-probe right before the read: an explicit path list throws
      // PATH_NOT_FOUND at RESOLUTION time for an already-deleted file —
      // ignoreMissingFiles only covers files vanishing during execution
      val paths = uploads.map(_._2).filter(fileExists)
      val anySkipped = paths.size < uploads.size
      if (paths.nonEmpty) {
        val idByPath = uploads.map { case (id, p) =>
          (normalize(p), id)
        }.toSeq.toDF("jpath", "_upload_id")
        val data = spark.read
          .option("header", "true").option("inferSchema", inferTypes.toString)
          .option("ignoreMissingFiles", "true")
          .csv(paths: _*)
          .withColumn("jpath", regexp_replace(input_file_name(), "^file:/+", "file:/"))
          .join(broadcast(idByPath), Seq("jpath"))
          .drop("jpath")
        // a headerless-but-valid upload (e.g. a single "\n", which passes
        // the reference's validation — SURVEY §2.7.2) has no data columns;
        // there is nothing to warehouse and partitionBy would reject a
        // table whose only column is the partition key
        if (data.columns.length > 1) {
          val target = new Path(warehouseDir, s"t_$sig").toString
          // With inferTypes on, the group re-infers over the SURVIVING
          // files — if a skipped (missing) upload's old partition was
          // written under a wider inferred type (e.g. the one file that
          // forced a column to string), dynamic overwrite would leave that
          // stale partition's parquet type conflicting with the re-written
          // ones. Rewrite the whole table directory in that case (static
          // overwrite truncates it first); otherwise keep the
          // partition-local idempotent re-load. A probe-missed upload's
          // group is unknowable (its header is gone), so ask the table
          // itself: does it hold a partition for any missing id?
          val holdsMissing = inferTypes && missingIds.nonEmpty && {
            val tdir = new Path(target)
            val tfs = tdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
            missingIds.exists(id =>
              tfs.exists(new Path(tdir, s"_upload_id=$id")))
          }
          val overwriteMode =
            if (inferTypes && (anySkipped || holdsMissing)) "static"
            else "dynamic"
          // row count rides the write job as an Observation metric —
          // dynamic overwrite only ever REPLACES partitions of the uploads
          // being written, so rows-written equals the table's post-load
          // row count for them; a separate read-back count job per table
          // would re-list and re-scan what was just written
          val obs = org.apache.spark.sql.Observation()
          data.observe(obs, count(lit(1)).as("n"))
            .write
            .mode("overwrite")
            .option("partitionOverwriteMode", overwriteMode)
            .partitionBy("_upload_id")
            .parquet(target)
          tables += 1
          rows += obs.get("n").asInstanceOf[Long]
        }
      }
    }
    (tables, rows)
  }

  /** Read one warehouse table by its header signature. */
  def table(sig: String): DataFrame =
    spark.read.parquet(new Path(warehouseDir, s"t_$sig").toString)

  /** List warehouse table signatures. */
  def tables(): Seq[String] = {
    val root = new Path(warehouseDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("t_")).map(_.stripPrefix("t_")).sorted
  }

  /** Driver-side existence probe (bounded by per-group upload count). */
  private def fileExists(p: String): Boolean = {
    val path = new Path(if (p.startsWith("file:")) p else s"file:$p")
    try path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
    catch { case _: java.io.IOException => false }
  }

  private def normalize(p: String): String = {
    val withScheme = if (p.startsWith("file:")) p else s"file:$p"
    withScheme.replaceFirst("^file:/+", "file:/")
  }
}

object CsvWarehouse {

  /** Header signature: 8 hex chars of sha-256 over the first line; None if
    * the file is gone. Runs ON EXECUTORS (the probe is distributed), so it
    * builds its own Hadoop configuration rather than capturing the
    * session's — a fresh `Configuration()` resolves the same filesystem
    * for any scheme'd path.
    */
  private[ingest] def headerSignatureOf(path: String): Option[String] = {
    val p = new Path(if (path.startsWith("file:")) path else s"file:$path")
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    try {
      val in = fs.open(p)
      try {
        // read until the first newline or EOF — a single read() may return
        // short (stream implementations only guarantee > 0 bytes), which
        // would truncate the header and split one schema into two tables
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8 * 1024)
        var done = false
        while (!done && out.size() < (1 << 20)) {
          val n = in.read(buf)
          if (n <= 0) done = true
          else buf.indexWhere(_ == '\n'.toByte, 0) match {
            case i if i >= 0 && i < n => out.write(buf, 0, i); done = true
            case _ => out.write(buf, 0, n)
          }
        }
        Some(java.security.MessageDigest.getInstance("SHA-256")
          .digest(out.toByteArray)
          .take(4).map("%02x".format(_)).mkString)
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }
  }
}
