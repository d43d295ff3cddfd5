package graft

import org.apache.spark.sql.SparkSession

/** Isolated ConnectedComponents measurement (builder-side, like
  * AdmissionBench): times ONLY the CC loop over a pre-dumped pair list,
  * so the loop-width dial can be A/B'd same-window without re-paying the
  * ~8-minute near-dup chain that builds the pairs at x300 — the chain's
  * wall swings ±40% across host windows (SCALING.md §8), which drowned
  * the ~10 s CC signal in every cross-window comparison.
  *
  * Usage: runMain graft.CcBench <pairsParquet> [repeats]
  *   (dump pairs once: runMain graft.Verify <sfDir> <out>
  *    dedup_near_dup_pipeline)
  *
  *   SPARK_GRAFT_SESSION_WIDTH  session shuffle width (default 544 — the
  *                              x300 fixture's Autoscale derivation, the
  *                              regime the loop-width fix targets)
  *   SPARK_GRAFT_CC_LOOP_WIDTH  "session" disables the per-loop derived
  *                              width (A/B baseline); int pins it; unset
  *                              = the derived default under test
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CcBench <pairsParquet> [repeats]")
    val repeats = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val width = sys.env.getOrElse("SPARK_GRAFT_SESSION_WIDTH", "544")
    val spark = GraftSession.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pairs = spark.read.parquet(args(0)).select("doc_a", "doc_b")
    pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = pairs.count() // materialize OUTSIDE every timing window
    val loopMode = sys.env.getOrElse("SPARK_GRAFT_CC_LOOP_WIDTH", "derived")
    // untimed warmup: pays JIT/codegen once
    graft.operators.ConnectedComponents.run(pairs)
    val secs = (1 to repeats).map { _ =>
      val t0 = System.nanoTime()
      val (labels, rounds) = graft.operators.ConnectedComponents.run(pairs)
      val comps = labels.select("component").distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[cc] $sec%.2fs rounds=$rounds comps=$comps")
      sec
    }
    val med = secs.sorted.apply(repeats / 2)
    println(f"""{"metric":"cc","pairs":$n,"session_width":$width,""" +
      f""""loop_width":"$loopMode","repeats":$repeats,""" +
      f""""med_sec":$med%.3f,"secs":${secs.map(s => f"$s%.3f")
        .mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
