package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
/** Times a single registered query N times — builder-side micro-benchmark. */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // warmup
    spark.read.parquet(s"$dir/documents.parquet").foreach(_ => ())
    args.foreach { name =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        // full materialization, like Bench — count() would let Catalyst
        // prune the computed columns and under-measure
        val df = SparkEntry.queries(name)(spark, dir)
        var n = 0L
        df.toLocalIterator().forEachRemaining(_ => n += 1)
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      }
    }
    spark.stop()
  }
}
