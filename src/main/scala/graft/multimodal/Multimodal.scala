package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed by per-partition batch UDFs (the Scala analog
  * of `mapInPandas` — one imperative loop per partition, vectorizable
  * batch shape, explicit output schema).
  *
  * The actual codecs are NOT in this container, so the decode kernel is a
  * clearly-marked STUB (`decodeReal`) plus a deterministic fake
  * (`fakeDecode`) driven by the payload's md5 — which keeps the entire
  * Spark-side plumbing (binary columns, schema, partition batching,
  * explode of per-frame rows) real and testable, and lets the DuckDB
  * oracle replicate the fake bit-for-bit.
  *
  * Scale notes: payload bytes never shuffle — metadata extraction is
  * map-side (mapPartitions), and downstream joins/aggs operate on the
  * small decoded-feature columns only. At 100 TB the payload column stays
  * in parquet until a partition-local decode touches it.
  */
object Multimodal {

  /** REAL decode entry point — requires an image/audio codec library.
    * Deliberately unimplemented in this environment.
    */
  def decodeReal(payload: Array[Byte], mime: String): Map[String, Any] =
    ??? // STUB: plug javax.imageio / ffmpeg / soundfile here

  /** Deterministic fake decode: metadata derived from md5(payload).
    * width = 32 + 8*d0, height = 32 + 8*d1, channels = 1 + d2 % 3,
    * n_frames = 2 + d3 % 4 — where d_i is the i-th hex digit value.
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    def d(i: Int) = Integer.parseInt(hex.substring(i, i + 1), 16)
    (32 + 8 * d(0), 32 + 8 * d(1), 1 + d(2) % 3, 2 + d(3) % 4)
  }

  /** Attach a binary payload + metadata struct to a text table (stand-in
    * for reading real image/audio bytes alongside metadata).
    */
  def asBinaryTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image/fake").as("mime"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))

  private val metaSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("width", IntegerType),
    StructField("height", IntegerType), StructField("channels", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Per-partition batch decode → one metadata row per payload. */
  def decodeMeta(bin: DataFrame): DataFrame = {
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(metaSchema))
    val idIdx = bin.schema.fieldIndex("doc_id")
    val payIdx = bin.schema.fieldIndex("payload")
    bin.mapPartitions { it =>
      it.map { r =>
        val (w, h, c, f) = fakeDecode(r.getAs[Array[Byte]](payIdx))
        Row(r.getLong(idIdx), w, h, c, f)
      }
    }(enc).toDF()
  }

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("frame_idx", IntegerType),
    StructField("frame_sig", StringType)))

  /** Frame sampling: emit one row per (fake-)decoded frame with a
    * per-frame signature — the flatMap shape real frame extraction has.
    */
  def sampleFrames(bin: DataFrame): DataFrame = {
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(frameSchema))
    val idIdx = bin.schema.fieldIndex("doc_id")
    val payIdx = bin.schema.fieldIndex("payload")
    bin.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payIdx)
        val (_, _, _, nFrames) = fakeDecode(payload)
        (0 until nFrames).iterator.map { i =>
          md.reset()
          md.update(payload)
          md.update(s":$i".getBytes("UTF-8"))
          Row(r.getLong(idIdx), i, md.digest().map("%02x".format(_)).mkString)
        }
      }
    }(enc).toDF()
  }
}
