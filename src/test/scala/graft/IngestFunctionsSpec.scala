package graft

import graft.functions.IngestFunctions._
import org.apache.spark.sql.functions._

/** Golden tests against Python semantics (values computed with CPython
  * hashlib/datetime, mirroring reference main.py:15-18,47,121).
  */
class IngestFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("pyIsoformatUtc matches datetime.isoformat() with and without micros") {
    val got = Seq("2025-11-28 09:30:00", "2025-11-28 09:30:00.123456")
      .toDF("s")
      .select(pyIsoformatUtc(to_timestamp($"s")).as("iso"))
      .as[String].collect()
    assert(got.toSeq == Seq(
      "2025-11-28T09:30:00+00:00",
      "2025-11-28T09:30:00.123456+00:00"))
  }

  test("uploadId matches Python sha256(f'{b}-{n}-{s}-{c}')[:16]") {
    val got = Seq(
      ("file:/inbox", "test-data.csv", 271L, "2025-11-28T09:30:00+00:00"),
      ("b", "f.csv", 0L, ""))
      .toDF("b", "n", "s", "c")
      .select(uploadId($"b", $"n", $"s", $"c").as("id"))
      .as[String].collect()
    assert(got.toSeq == Seq("ca46259397da0d7f", "1ea08f2fe4ac0097"))
  }

  test("golden: the reference's EFFECTIVE key degenerates to bucket+name") {
    // The reference never fetches blob metadata (bucket.blob() is a local
    // handle, main.py:41): blob.size is None and the f-string renders the
    // literal "None", so its effective hash input is f"{bucket}-{name}-None-".
    // CPython: sha256('my-bucket-data.csv-None-').hexdigest()[:16].
    // The engine DELIBERATELY deviates, hashing real size+mtime — assert
    // both the degenerate reference key and that the engine's differs.
    val refEffective = Seq(("my-bucket", "data.csv"))
      .toDF("b", "n")
      .select(substring(sha2(concat_ws("-",
        $"b", $"n", lit("None"), lit("")), 256), 1, 16).as("id"))
      .as[String].head()
    assert(refEffective == "137505f703c7d4a7")
    val engine = Seq(("my-bucket", "data.csv", 271L, "2025-11-28T09:30:00+00:00"))
      .toDF("b", "n", "s", "c")
      .select(uploadId($"b", $"n", $"s", $"c").as("id"))
      .as[String].head()
    assert(engine != refEffective)
  }

  test("uploadId null created behaves as the reference's '' fallback") {
    val got = Seq(("b", "f.csv", 0L))
      .toDF("b", "n", "s")
      .select(uploadId($"b", $"n", $"s", lit(null).cast("string")).as("id"))
      .as[String].collect()
    assert(got.head == "1ea08f2fe4ac0097")
  }

  test("pySplitLineCount reproduces len(content.split('\\n')) fenceposts") {
    val cases = Seq("", "\n", "a", "a\nb\n", "h\n1\n2\n3\n4\n5\n")
    val got = cases.toDF("c")
      .select(pySplitLineCount($"c").as("n")).as[Int].collect()
    assert(got.toSeq == Seq(1, 2, 1, 3, 7))
  }

  test("isCsvPath + validation predicate") {
    val df = Seq(("A.CSV", 2), ("b.txt", 5), ("c.csv", 1)).toDF("p", "n")
    val keep = df.filter(isCsvPath($"p") && isValidCsv($"n"))
      .select("p").as[String].collect()
    assert(keep.toSeq == Seq("A.CSV"))
  }

  test("envelopeJson is structurally faithful JSON, with escaping") {
    val got = Seq(
      ("ce05376591fe5c7d", "bkt", "a.csv"),
      ("deadbeef00000000", "bkt", "we\"ird\\name.csv"))
      .toDF("u", "b", "f")
      .select(envelopeJson($"u", $"b", $"f").as("j")).as[String].collect()
    assert(got(0) ==
      """{"upload_id":"ce05376591fe5c7d","bucket_name":"bkt","file_name":"a.csv"}""")
    // quotes/backslashes must be escaped (json.dumps does; the old printf
    // template emitted invalid JSON here — ADVICE.md round 1)
    assert(got(1) ==
      """{"upload_id":"deadbeef00000000","bucket_name":"bkt","file_name":"we\"ird\\name.csv"}""")
  }
}
