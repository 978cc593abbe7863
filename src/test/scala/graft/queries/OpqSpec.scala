package graft.queries

import graft.SparkSuite

/** OPQ (queries/Opq.scala + the v21 gate's machinery): the theorem-
  * backed training invariants, the rotation-convention pin, and the
  * recall story on the geometry OPQ exists for.
  */
class OpqSpec extends SparkSuite {

  test("alternation is monotone, orthogonal, and improves over identity-PQ") {
    val res = Vectors.opqFor(spark, sf0001)
    assert(Opq.orthDefect(res.r) <= 1e-8,
      s"R not orthogonal: defect ${Opq.orthDefect(res.r)}")
    res.objectives.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9 * math.max(1.0, a),
        s"objective rose $a -> $b — a half-step is not a block minimizer")
      case _ => ()
    }
    assert(res.objectives.last < res.objectives.head * 0.95,
      s"OPQ gained <5% over identity on the training sample " +
        s"(${res.objectives.head} -> ${res.objectives.last}) — " +
        "the alternation is not actually optimizing")
  }

  test("driver objective == distributed frozen-codebook corpus error (convention pin)") {
    // the r20 bug this pins: the corpus UDF applied R as a COLUMN
    // rotation while the trainer optimized the ROW convention — every
    // orthogonality/monotonicity/roundtrip invariant still held (Rᵀ is
    // orthogonal too), and only this equality exposed the inverse
    // rotation being served. The sample is the whole corpus at this
    // scale, so driver objective and distributed error are the same
    // number through two independent code paths.
    val res = Vectors.opqFor(spark, sf0001)
    val (err, _) = Vectors.pqVariantEval(spark, sf0001, 8,
      rot = Some(res.r), frozenCb = Some(res.codebooks))
    val want = res.objectives.last
    assert(math.abs(err - want) <= 1e-6 * math.max(1.0, want),
      s"distributed corpus error $err != driver objective $want — " +
        "rotation/codebook convention drift between the two chains")
  }

  test("on a correlated (mixed) corpus, OPQ beats plain PQ on error AND recall") {
    val sample = Vectors.embSample(spark, sf0001)
    val q = Opq.mixer(sample(0).length)
    def mixRow(x: Array[Double]): Array[Double] =
      Array.tabulate(x.length)(i => {
        var s = 0.0; var j = 0
        while (j < x.length) { s += q(j)(i) * x(j); j += 1 }
        s
      })
    val res = Opq.train(sample.map(mixRow), 8, 64, iters = 4, lloydIters = 2)
    val (errPq, recPq) = Vectors.pqVariantEval(spark, sf0001, 8,
      rot = None, premix = Some(q))
    val (errOpq, recOpq) = Vectors.pqVariantEval(spark, sf0001, 8,
      rot = Some(res.r), premix = Some(q), frozenCb = Some(res.codebooks))
    assert(errOpq < errPq * 0.95,
      s"OPQ error $errOpq not <5% under plain $errPq on mixed data")
    assert(recOpq > recPq,
      s"OPQ recall $recOpq not above plain $recPq on mixed data " +
        "(measured r20: 0.45 vs 0.29)")
  }
}
