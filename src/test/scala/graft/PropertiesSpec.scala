package graft

import graft.functions.IngestFunctions._
import graft.ledger.LedgerStore
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (SURVEY.md §5 item 3): engine behavior vs a
  * directly-computed model over generated inputs. Inputs are drawn from
  * ScalaCheck generators with a fixed seed and evaluated in one DataFrame
  * per property (one Spark job, many cases).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  test("property: pySplitLineCount == Python str.split('\\n') length") {
    val strGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const('\n'), 1 -> Gen.const(' ')))
      .map(_.mkString)
    val cases = "" :: "\n" :: "a\nb\n" :: samples(strGen, 300)
    // model: Python s.split('\n') length == Java split with -1 limit
    val expected = cases.map(s => s.split("\n", -1).length)
    val got = cases.toDF("s")
      .select(pySplitLineCount($"s")).as[Int].collect().toList
    assert(got == expected)
  }

  test("property: uploadId == sha256(f\"{b}-{n}-{s}-{c}\")[:16] model") {
    val part = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.const('-'), 1 -> Gen.const('.')))
      .map(_.mkString)
    val cases = samples(Gen.zip(part, part, Gen.chooseNum(0L, 1L << 40), part), 200)
    def model(b: String, n: String, sz: Long, c: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$b-$n-$sz-$c".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    val expected = cases.map { case (b, n, sz, c) => model(b, n, sz, c) }
    val got = cases.toDF("b", "n", "sz", "c")
      .select(uploadId($"b", $"n", $"sz", $"c")).as[String].collect().toList
    assert(got == expected)
  }

  test("property: ledger merge is per-column coalesce(new, old)") {
    val store = new LedgerStore(spark, tmpDir("prop-ledger"))
    val statusGen = Gen.oneOf("pending", "processing", "done", "failed")
    val optLong = Gen.option(Gen.chooseNum(0L, 9999L))
    val ids = (0 until 60).map(i => f"id$i%04d")
    val oldRows = ids.take(40).map(id =>
      (id, Some("b"), Some(s"f-$id"), samples(optLong, 1).head,
        Some(samples(statusGen, 1).head)))
    val newRows = ids.drop(20).map(id =>
      (id, None: Option[String], Some(s"g-$id"), samples(optLong, 1).head,
        Some(samples(statusGen, 1).head)))
    def df(rows: Seq[(String, Option[String], Option[String], Option[Long], Option[String])]) =
      rows.toDF("upload_id", "bucket_name", "file_name", "file_size", "status")
    store.merge(df(oldRows))
    store.merge(df(newRows))
    val got = store.read()
      .select("upload_id", "bucket_name", "file_name", "file_size", "status")
      .as[(String, Option[String], Option[String], Option[Long], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    val oldM = oldRows.map(r => r._1 -> r).toMap
    val newM = newRows.map(r => r._1 -> r).toMap
    ids.foreach { id =>
      val o = oldM.get(id); val n = newM.get(id)
      val exp = (id,
        n.flatMap(_._2).orElse(o.flatMap(_._2)),
        n.flatMap(_._3).orElse(o.flatMap(_._3)),
        n.flatMap(_._4).orElse(o.flatMap(_._4)),
        n.flatMap(_._5).orElse(o.flatMap(_._5)))
      assert(got(id) == exp, s"merge mismatch for $id")
    }
  }

  test("property: HLL approx distinct within its error bound") {
    val r = SparkEntry.queries("q_approx_distinct")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val approx = row.getAs[Long]("approx_users").toDouble
      val exact = row.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.10, // 5× the 2% rsd
        s"approx $approx too far from exact $exact")
    }
  }
}
