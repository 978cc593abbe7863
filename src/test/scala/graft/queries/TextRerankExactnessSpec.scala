package graft.queries

import graft.SparkSuite

/** The loser-exactness invariant's one former hole, pinned shut
  * (VERDICT r16 "what's wrong" #1): `exactJaccard` must return a `jx`
  * row for EVERY borderline pair — including a pair whose shingle sets
  * are DISJOINT (reachable only when ~a dozen independent 64-bit slot
  * minima collide, so the estimate says "near-dup" about two unrelated
  * docs). The r16 inner-join form dropped exactly those pairs, and the
  * downstream `coalesce(jx, jhat)` then issued a loser verdict FROM THE
  * ESTIMATE — the one path the "structural" claim said could not exist.
  * The docs here stand in for that collision (the spec injects the
  * borderline verdict directly, which is the only way to reach the
  * state deterministically).
  */
class TextRerankExactnessSpec extends SparkSuite {
  import org.apache.spark.sql.functions.col

  test("a borderline pair with ZERO shared shingles scores jx = 0.0") {
    import spark.implicits._
    val sh = Seq(
      (1L, "a b c"), (1L, "b c d"),
      (2L, "x y z"), (2L, "y z w")).toDF("doc_id", "shingle")
    val borderline = Seq((1L, 2L)).toDF("doc1", "doc2")
    val out = Text.exactJaccard(sh, borderline).collect()
    assert(out.length == 1, s"expected one jx row per borderline pair, got ${out.length}")
    assert(out.head.getDouble(2) == 0.0,
      s"disjoint-shingle pair must score exact 0.0, got ${out.head.getDouble(2)}")
  }

  test("an overlapping pair scores the true intersection jaccard") {
    import spark.implicits._
    // docs {a,b,c} and {b,c,d}: |∩| = 2, |∪| = 4 → J = 0.5
    val sh = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "b"), (2L, "c"), (2L, "d")).toDF("doc_id", "shingle")
    val borderline = Seq((1L, 2L)).toDF("doc1", "doc2")
    val out = Text.exactJaccard(sh, borderline).collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) == 0.5)
  }

  test("mixed borderline slice: one row per pair, each from the exact path") {
    import spark.implicits._
    val sh = Seq(
      (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"),   // J(1,2) = 1.0
      (3L, "p"), (3L, "q")    // J(1,3) = 0.0 (disjoint)
    ).toDF("doc_id", "shingle")
    val borderline = Seq((1L, 2L), (1L, 3L)).toDF("doc1", "doc2")
    val out = Text.exactJaccard(sh, borderline)
    assert(out.count() == 2, "exactJaccard must be total over the borderline slice")
    val byPair = out.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(byPair((1L, 2L)) == 1.0)
    assert(byPair((1L, 3L)) == 0.0)
    assert(out.filter(col("jx").isNull).count() == 0)
  }
}
