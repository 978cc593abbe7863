package graft.multimodal

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  private lazy val bin = Multimodal.asBinaryTable(
    graft.Tables.documents(spark, sf0001))

  test("binary table: payload bytes + typed metadata struct") {
    val r = bin.select(
      col("doc_id"), length(col("payload")).as("n"), col("meta.n_bytes"), col("meta.mime"))
      .filter(col("n") =!= col("n_bytes")).count()
    assert(r === 0)
    assert(bin.schema("payload").dataType.typeName === "binary")
  }

  test("decodeMeta: deterministic, one row per payload, bounded fields") {
    val meta = Multimodal.decodeMeta(bin)
    assert(meta.count() === bin.count())
    val bad = meta.filter(
      col("width") < 32 || col("width") > 152 ||
        col("channels") < 1 || col("channels") > 3 ||
        col("n_frames") < 2 || col("n_frames") > 5).count()
    assert(bad === 0)
    // deterministic across runs
    val a = meta.orderBy("doc_id").collect()
    val b = Multimodal.decodeMeta(bin).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("sampleFrames: row count per doc equals decoded n_frames") {
    val meta = Multimodal.decodeMeta(bin)
    val frames = Multimodal.sampleFrames(bin)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), countDistinct("frame_sig").as("nd"))
    val joined = meta.join(frames, "doc_id")
    assert(joined.filter(col("n") =!= col("n_frames")).count() === 0)
    assert(joined.filter(col("nd") =!= col("n")).count() === 0) // sigs unique
  }

  test("decodeReal: PNG round-trips real width/height/channels") {
    val payload = Multimodal.pngPayload(48, 27, seed = 7L)
    val m = Multimodal.decodeReal(payload, "image/png")
    assert(m("width") === 48 && m("height") === 27 && m("channels") === 3)
    // payload is a genuine PNG (magic bytes), not a fake
    assert((payload.take(4).map(_ & 0xff)).toSeq === Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))
    // deterministic: same seed → same bytes
    assert(Multimodal.pngPayload(48, 27, 7L).toSeq === payload.toSeq)
  }

  test("decodeReal: non-image mimes and garbage bytes are rejected loudly") {
    assertThrows[IllegalArgumentException] {
      Multimodal.decodeReal(Array[Byte](1, 2, 3), "audio/wav")
    }
    assertThrows[IllegalArgumentException] {
      Multimodal.decodeReal(Array[Byte](1, 2, 3), "image/png")
    }
  }

  test("decodeMetaReal: distributed decode recovers per-doc dimensions") {
    import spark.implicits._
    val docs = Seq((0L, 10L), (1L, 40L), (2L, 33L)).toDF("doc_id", "n_chars")
    val meta = Multimodal.decodeMetaReal(Multimodal.syntheticPngTable(docs))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(meta(0L) === ((16 + 10, 16 + 0, 3)))
    assert(meta(1L) === ((16 + 8, 16 + 1, 3)))
    assert(meta(2L) === ((16 + 1, 16 + 2, 3)))
  }
}
