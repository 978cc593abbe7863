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
  * Decode tiers:
  *  - IMAGES are decoded for real via `javax.imageio` (PNG/BMP/GIF/JPEG —
  *    in the JDK, zero extra dependencies): [[decodeReal]],
  *    [[decodeMetaReal]], exercised end-to-end by the m3 oracle query.
  *  - AUDIO/VIDEO codecs are NOT in this container; those mimes throw from
  *    [[decodeReal]], and the deterministic fake ([[fakeDecode]], driven by
  *    the payload's md5) stands in so the frame-sampling plumbing stays
  *    real and the DuckDB oracle can replicate it bit-for-bit.
  *
  * Scale notes: payload bytes never shuffle — metadata extraction is
  * map-side (mapPartitions), and downstream joins/aggs operate on the
  * small decoded-feature columns only. At 100 TB the payload column stays
  * in parquet until a partition-local decode touches it.
  */
object Multimodal {

  /** Real decode: image payloads through `javax.imageio`. Audio/video
    * would plug in here (ffmpeg/soundfile bindings) — unsupported in this
    * build and rejected loudly rather than faked.
    */
  def decodeReal(payload: Array[Byte], mime: String): Map[String, Any] = {
    require(mime.startsWith("image/"),
      s"no codec for '$mime' in this build (javax.imageio images only)")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    Map(
      "width" -> img.getWidth, "height" -> img.getHeight,
      "channels" -> img.getColorModel.getNumComponents, "n_frames" -> 1)
  }

  /** Deterministic synthetic PNG: `width`×`height` RGB, pixels from a
    * simple arithmetic hash of (seed, x, y). Real bytes through the real
    * encoder — what the m3 oracle decodes back.
    */
  def pngPayload(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, (seed * 31 + x * 7 + y * 131).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val realMetaSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("width", IntegerType),
    StructField("height", IntegerType), StructField("channels", IntegerType)))

  /** Per-partition REAL image decode → (doc_id, width, height, channels).
    * In-memory decode only (ImageIO's disk cache off — no tmp-file churn
    * inside executors).
    */
  def decodeMetaReal(bin: DataFrame, mime: String = "image/png"): DataFrame = {
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(realMetaSchema))
    val idIdx = bin.schema.fieldIndex("doc_id")
    val payIdx = bin.schema.fieldIndex("payload")
    bin.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val m = decodeReal(r.getAs[Array[Byte]](payIdx), mime)
        Row(r.getLong(idIdx), m("width"), m("height"), m("channels"))
      }
    }(enc).toDF()
  }

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

  /** Spread a codec-bound frame across the cluster's cores when the
    * scan gave it fewer partitions (r20): sf-scale documents.parquet is
    * one input split, so every decode/encode mapPartitions ran as ONE
    * task — m3/m4 measured taskSec ≈ wall (fully serial PNG codec work
    * on a 32-core box). Per-row codec cost is what these operators are
    * bound by, so parallelism = cores is the right shape at any scale;
    * a corpus whose scan already has enough partitions keeps them (no
    * extra exchange), exactly the guide's repartition-after-unsplittable-
    * read rule.
    */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Attach a binary payload + metadata struct to a text table (stand-in
    * for reading real image/audio bytes alongside metadata).
    */
  def asBinaryTable(docs: DataFrame): DataFrame =
    spread(docs).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image/fake").as("mime"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))

  private val binSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("payload", BinaryType)))

  /** Real PNG payloads with dimensions derived from the doc row
    * (width = 16 + n_chars % 32, height = 16 + doc_id % 24) — gives the
    * decode path an oracle: DuckDB recomputes the dims arithmetically
    * while Spark round-trips them through the actual PNG codec.
    * Input must have (doc_id: long, n_chars: long).
    */
  def syntheticPngTable(docs: DataFrame): DataFrame = {
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(binSchema))
    val idIdx = docs.schema.fieldIndex("doc_id")
    val ncIdx = docs.schema.fieldIndex("n_chars")
    spread(docs).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(idIdx)
        val nc = r.getLong(ncIdx)
        Row(id, pngPayload((16 + nc % 32).toInt, (16 + id % 24).toInt, id))
      }
    }(enc).toDF()
  }

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

  private val thumbSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("thumb_w", IntegerType),
    StructField("thumb_h", IntegerType), StructField("pix_sum", LongType)))

  /** Real thumbnail path: decode the payload through the actual codec,
    * resize by DETERMINISTIC floor-mapped nearest neighbor
    * (`src = out_coord * src_dim / target_dim`, integer floor — no
    * implementation-defined AWT interpolation), re-encode as PNG, decode
    * AGAIN, and checksum the decoded pixels. PNG is lossless, so the
    * final checksum equals a closed-form sum over source pixels — the
    * whole decode→resize→encode→decode pipeline is hash-gated, not just
    * the arithmetic.
    */
  def resizeThumb(bin: DataFrame, tw: Int = 8, th: Int = 8): DataFrame = {
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(thumbSchema))
    val idIdx = bin.schema.fieldIndex("doc_id")
    val payIdx = bin.schema.fieldIndex("payload")
    bin.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](payIdx)))
        require(img != null, "payload is not a decodable image")
        val out = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            out.setRGB(x, y,
              img.getRGB(x * img.getWidth / tw, y * img.getHeight / th))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        val back = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bos.toByteArray))
        var s = 0L
        var yy = 0
        while (yy < th) {
          var xx = 0
          while (xx < tw) {
            s += (back.getRGB(xx, yy) & 0xffffff).toLong
            xx += 1
          }
          yy += 1
        }
        Row(r.getLong(idIdx), tw, th, s)
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
