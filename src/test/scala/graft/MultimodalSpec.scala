package graft

import graft.multimodal.{MediaRow, Multimodal}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary schema, partition-parallel decode batches,
  * chunk sampling. The decode itself is a documented deterministic stub
  * (no media libs in this runtime) — the dataflow around it is real.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = Multimodal.syntheticFromDocuments(spark,
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))

  test("binary media table: typed schema, deterministic payloads") {
    val m = corpus()
    assert(m.schema("content").dataType.typeName == "binary")
    assert(m.count() == 500)
    val types = m.select("media_type").distinct().as[String].collect().toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("feature extraction is partition-parallel and deterministic") {
    val m = corpus().repartition(8)
    val f1 = Multimodal.extractFeatures(m).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(m.repartition(3)).collect()
      .sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.toSeq == f2.toSeq) // partitioning must not change results
    assert(f1.forall(_.ok))
    assert(f1.forall(f => f.n_bytes > 0 && f.fingerprint.length == 16))
    // stub dimensions are a pure function of bytes
    val video = f1.filter(_.media_type == "video")
    assert(video.forall(f => f.n_frames == 1 + f.n_bytes / 4096))
  }

  test("chunk sampling explodes strided fixed-size binary chunks") {
    val m = corpus().toDF()
    val chunks = Multimodal.sampleChunks(m, chunkBytes = 100, stride = 2)
    val one = chunks.filter($"media_id" === 1).orderBy("chunk_idx").collect()
    val nBytes = m.filter($"media_id" === 1)
      .select(length($"content")).as[Int].collect().head
    val nChunks = math.ceil(nBytes / 100.0).toInt
    val expectedIdx = (0 until nChunks by 2).toSeq
    assert(one.map(_.getAs[Int]("chunk_idx")).toSeq == expectedIdx)
    // every chunk but the last is exactly chunkBytes
    val sizes = one.map(r => r.getAs[Array[Byte]]("chunk").length)
    assert(sizes.init.forall(_ == 100))
  }
}
