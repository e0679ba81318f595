package graft

import org.apache.spark.sql.functions._

import graft.operators.Media

/** Multimodal plumbing: schema, batch decode shape, explode fan-out.
  * (The decoder itself is a documented deterministic stub.) */
class MediaSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a" * 1000, "en"), (2L, "b" * 2500, "de"), (3L, "c", "en"))
    .toDF("doc_id", "text", "lang")

  test("mediaTable carries blob + typed metadata struct") {
    val m = Media.mediaTable(docs)
    assert(m.schema("bytes").dataType.typeName == "binary")
    val meta = m.select(col("doc_id"), col("meta.n_bytes"))
      .as[(Long, Int)].collect().toMap
    assert(meta == Map(1L -> 1000, 2L -> 2500, 3L -> 1))
  }

  test("decodeStub is a pure function of the byte length") {
    val a = Media.decodeStub(Media.MediaIn(7L, Array.fill(1000)(1.toByte), "x"))
    assert(a == Media.MediaMeta(7L, 64 + 1000 % 512, 64 + 7000 % 512, 1000 % 256, 1000L))
  }

  test("decode runs per-partition and drops the blob") {
    val d = Media.decode(spark, Media.mediaTable(docs)).toDF()
    assert(d.columns.toSeq ==
      Seq("doc_id", "width", "height", "mean_luma", "n_bytes"))
    assert(d.count() == 3)
  }

  test("resize never upscales and preserves aspect ratio bound") {
    val d = Media.decode(spark, Media.mediaTable(docs)).toDF()
    val r = Media.resize(d, 256)
      .select(greatest(col("out_w"), col("out_h"))).as[Int].collect()
    assert(r.forall(_ <= 256))
  }

  test("frameSample fans out one row per sampled frame") {
    val f = Media.frameSample(Media.mediaTable(docs), 1000L, step = 2)
    // doc1: 1000B -> 2 frames -> idx 0; doc2: 2500B -> 3 -> idx 0,2; doc3: 1 -> idx 0
    val got = f.orderBy("doc_id", "frame_idx")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 0L), (2L, 2L), (3L, 0L)))
  }
}
