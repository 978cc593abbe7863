package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[Vectors.lshSignatures]]' broadcast-state form (r21,
  * [[graft.functions.HyperplaneBands]]) bit-identical to the literal form
  * it replaced — bands·planesPerBand `array_dot(embedding, array(<dims
  * literals>))` projections with `CASE WHEN s >= 0` sign bits — on the
  * real sf0.001 embeddings. The v2 oracle hash-checks the 4×4 instance
  * every round, but only at the locked banding; this spec holds the
  * equivalence at deep/asymmetric bandings (the v9 auto-banding regime)
  * where no oracle reaches.
  */
class HyperplaneSigParitySpec extends SparkSuite {

  /** The pre-r21 literal implementation, verbatim (minus memo). */
  private def literalSignatures(
      emb: DataFrame, bands: Int, planesPerBand: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val md = java.security.MessageDigest.getInstance("MD5")
    def coef(p: Int, d: Int): Double = {
      val hex = md.digest(s"$p:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (hex.charAt(0) < '8') 1.0 else -1.0
    }
    val dims = emb.select(size(col("embedding"))).head.getInt(0)
    val nPlanes = bands * planesPerBand
    val projCols = (0 until nPlanes).map { p =>
      val arr = (0 until dims).map(coef(p, _)).mkString("array(", "D, ", "D)")
      expr(s"array_dot(embedding, $arr)").as(s"s$p")
    }
    def bit(p: Int) = s"CASE WHEN s$p >= 0 THEN '1' ELSE '0' END"
    val bandCols = (0 until bands).map { b =>
      val bits = (0 until planesPerBand).map(i => bit(planesPerBand * b + i))
      s"struct($b as band, concat(${bits.mkString(", ")}) as bkey)"
    }
    emb.select(col("vec_id") +: projCols: _*)
      .select(col("vec_id"), explode(expr(s"array(${bandCols.mkString(", ")})")).as("b"))
      .select(col("vec_id"), col("b.band").as("band"), col("b.bkey").as("bkey"))
  }

  private def rows(df: DataFrame): Seq[(Long, Int, String)] =
    df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sortBy(identity)
      .toSeq

  private def check(bands: Int, depth: Int): Unit = {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val got = rows(Vectors.lshSignatures(emb, bands, depth))
    val want = rows(literalSignatures(emb, bands, depth))
    assert(got.size == want.size,
      s"row count at ${bands}x$depth: ${got.size} vs ${want.size}")
    assert(got == want, s"signature mismatch at ${bands}x$depth")
  }

  test("broadcast-state == literal at the oracle-locked 4x4") { check(4, 4) }

  test("broadcast-state == literal at a deep banding (1x96, the probe shape)") {
    check(1, 96)
  }

  test("broadcast-state == literal at an asymmetric auto-style banding (17x9)") {
    check(17, 9)
  }
}
