package graft.queries

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-pipeline queries: the binary-payload decode and frame-sample
  * paths (mapPartitions batch UDFs over opaque bytes) with DuckDB oracles
  * that replicate the deterministic fake decode from md5 arithmetic.
  */
object Media {

  // hex digit i of md5(text), as an int — shared oracle helper
  private def hx(i: Int) =
    s"strpos('0123456789abcdef', substr(md5(text), ${i + 1}, 1)) - 1"

  val all: Seq[GQuery] = Seq(

    GQuery(
      "m1_decode_meta",
      s"""SELECT doc_id,
         |  CAST(32 + 8 * (${hx(0)}) AS INT) AS width,
         |  CAST(32 + 8 * (${hx(1)}) AS INT) AS height,
         |  CAST(1 + (${hx(2)}) % 3 AS INT) AS channels,
         |  CAST(2 + (${hx(3)}) % 4 AS INT) AS n_frames
         |FROM documents""".stripMargin) { (s, dir) =>
      Multimodal.decodeMeta(Multimodal.asBinaryTable(Tables.documents(s, dir)))
    },

    GQuery(
      "m2_frame_sample",
      s"""SELECT doc_id, CAST(i AS INT) AS frame_idx,
         |  md5(text || ':' || CAST(i AS VARCHAR)) AS frame_sig
         |FROM (
         |  SELECT doc_id, text,
         |    unnest(generate_series(0, 2 + (${hx(3)}) % 4 - 1)) AS i
         |  FROM documents)""".stripMargin) { (s, dir) =>
      Multimodal.sampleFrames(Multimodal.asBinaryTable(Tables.documents(s, dir)))
    },

    // REAL thumbnail resize: synthetic PNG → decode → floor-mapped nearest
    // neighbor to 8×8 → re-encode → decode → pixel checksum; the oracle
    // recomputes the checksum in closed form from the pixel generator
    // pixel(x,y) = (seed*31 + x*7 + y*131) & 0xffffff, seed = doc_id,
    // src dims (16 + n_chars % 32) × (16 + doc_id % 24)
    GQuery(
      "m4_resize_png",
      """SELECT d.doc_id, CAST(8 AS INT) AS thumb_w, CAST(8 AS INT) AS thumb_h,
        |  CAST(SUM(
        |    (d.doc_id * 31
        |     + ((g.x * (16 + d.n_chars % 32)) // 8) * 7
        |     + ((g.y * (16 + d.doc_id % 24)) // 8) * 131) % 16777216
        |  ) AS BIGINT) AS pix_sum
        |FROM documents d,
        |  (SELECT a.x, b.y
        |   FROM (SELECT unnest(generate_series(0, 7)) AS x) a,
        |        (SELECT unnest(generate_series(0, 7)) AS y) b) g
        |GROUP BY d.doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      Multimodal.resizeThumb(
        Multimodal.syntheticPngTable(
          Tables.documents(s, dir)
            .select(col("doc_id").cast("long"), col("n_chars").cast("long"))))
    },

    // REAL image decode: synthesize PNG bytes with dims derived from doc
    // fields, decode them back through javax.imageio — the oracle
    // recomputes the dims arithmetically, so the whole encode→decode
    // round-trip is hash-gated
    GQuery(
      "m3_decode_png",
      """SELECT doc_id,
        |  CAST(16 + n_chars % 32 AS INT) AS width,
        |  CAST(16 + doc_id % 24 AS INT) AS height,
        |  CAST(3 AS INT) AS channels
        |FROM documents""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      Multimodal.decodeMetaReal(
        Multimodal.syntheticPngTable(
          Tables.documents(s, dir)
            .select(col("doc_id").cast("long"), col("n_chars").cast("long"))))
    }
  )
}
