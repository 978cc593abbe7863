package graft.queries

/** OPQ — Optimized Product Quantization (Ge, He, Ke, Sun: "Optimized
  * Product Quantization for Approximate Nearest Neighbor Search", CVPR
  * 2013; the non-parametric alternating solver FAISS ships as
  * `OPQMatrix`). Learns a d×d ORTHOGONAL rotation R minimizing the PQ
  * quantization error `‖X R − decode(encode(X R))‖²_F` by alternating:
  *
  *  1. with R fixed — Lloyd PQ training in the rotated space, the
  *     engine's exact recipe (vec-id-ordered seed on the FIRST
  *     alternation, (dist, code)-min deterministic assignment, mean
  *     update), WARM-STARTED from the previous alternation's codebooks
  *     afterwards (re-seeding could raise the objective and void the
  *     monotonicity theorem the v21 gate pins);
  *  2. with codes fixed — the orthogonal Procrustes solution
  *     R = U Vᵀ from SVD(Yᵀ X), Y the reconstruction matrix.
  *
  * Both half-steps are exact minimizers of the shared objective over
  * their block, so the recorded objective sequence is non-increasing
  * and the final objective is ≤ the identity-rotation (plain PQ)
  * objective — the two theorem-backed invariants v21 gates on. Driver-
  * side over a bounded training sample (R is d×d — 64×64 here; FAISS
  * trains OPQ the same way, on a subset); the corpus encode under R
  * runs distributed through the unchanged PQ chain.
  */
object Opq {

  /** @param r          the learned rotation, row-major d×d
    * @param codebooks  the co-trained codebooks (m × k × sub) — serving
    *                   must use THESE with R (FAISS keeps the OPQ
    *                   pretrain's centroids too; a from-scratch retrain
    *                   in rotated space forfeits the alternation's gain)
    * @param objectives quantization error after EVERY half-step
    *                   (identity-PQ first): 1 + 2·iters entries
    */
  final case class Result(r: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], objectives: Seq[Double])

  /** Train on `x` (n×d, row-major; row order = the deterministic
    * vec_id order — the seed recipe depends on it).
    */
  def train(x: Array[Array[Double]], m: Int, k: Int, iters: Int,
      lloydIters: Int): Result = {
    import breeze.linalg.{DenseMatrix, svd}
    val n = x.length
    val d = x(0).length
    require(d % m == 0, s"dim $d not divisible by M=$m")
    require(n >= k, s"training sample ($n) smaller than codebook size $k")
    val sub = d / m
    val xm = DenseMatrix.tabulate(n, d)((i, j) => x(i)(j))
    var r = DenseMatrix.eye[Double](d)
    var codebooks: Array[Array[Array[Double]]] = null // m × k × sub
    val objectives = scala.collection.mutable.ArrayBuffer.empty[Double]

    // one Lloyd pass (assign + update) per codebook, engine recipe
    def assign(xr: DenseMatrix[Double], cb: Array[Array[Array[Double]]])
        : Array[Array[Int]] =
      Array.tabulate(n) { i =>
        Array.tabulate(m) { s =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          val kk = cb(s).length
          while (c < kk) {
            var dd = 0.0; var j = 0
            while (j < sub) {
              val diff = xr(i, s * sub + j) - cb(s)(c)(j)
              dd += diff * diff; j += 1
            }
            // (dist, code)-min tie-break: strict < keeps the lower code
            if (dd < bestD) { bestD = dd; best = c }
            c += 1
          }
          best
        }
      }
    def update(xr: DenseMatrix[Double], codes: Array[Array[Int]])
        : Array[Array[Array[Double]]] = {
      val sums = Array.fill(m, k, sub)(0.0)
      val cnts = Array.fill(m, k)(0L)
      var i = 0
      while (i < n) {
        var s = 0
        while (s < m) {
          val c = codes(i)(s); cnts(s)(c) += 1
          var j = 0
          while (j < sub) { sums(s)(c)(j) += xr(i, s * sub + j); j += 1 }
          s += 1
        }
        i += 1
      }
      Array.tabulate(m, k) { (s, c) =>
        if (cnts(s)(c) == 0) codebooks(s)(c) // emptied cluster: keep
        else sums(s)(c).map(_ / cnts(s)(c))
      }.map(_.toArray)
    }
    def reconstruct(codes: Array[Array[Int]],
        cb: Array[Array[Array[Double]]]): DenseMatrix[Double] =
      DenseMatrix.tabulate(n, d) { (i, j) =>
        cb(j / sub)(codes(i)(j / sub))(j % sub) }
    def err(xr: DenseMatrix[Double], y: DenseMatrix[Double]): Double = {
      var e = 0.0; var i = 0
      while (i < n) {
        var j = 0
        while (j < d) { val diff = xr(i, j) - y(i, j); e += diff * diff; j += 1 }
        i += 1
      }
      e
    }

    var xr = xm * r
    // identity-PQ baseline: full Lloyd from the engine's seed
    codebooks = Array.tabulate(m, k)((s, c) =>
      Array.tabulate(sub)(j => xr(c, s * sub + j))).map(_.toArray)
    var codes = assign(xr, codebooks)
    var it = 0
    while (it < lloydIters) {
      codebooks = update(xr, codes); codes = assign(xr, codebooks); it += 1
    }
    objectives += err(xr, reconstruct(codes, codebooks))

    var t = 0
    while (t < iters) {
      // (2) Procrustes: R = U Vᵀ of SVD(Xᵀ Y) — exact argmin_R ‖XR−Y‖
      val y = reconstruct(codes, codebooks)
      val svd.SVD(u, _, vt) = svd(xm.t * y)
      r = u * vt
      xr = xm * r
      // rotating moved the data under FIXED codes: re-measure, then (1)
      objectives += err(xr, reconstruct(codes, codebooks))
      // (1) Lloyd warm-started from the previous codebooks
      it = 0
      while (it < lloydIters) {
        codes = assign(xr, codebooks); codebooks = update(xr, codes); it += 1
      }
      codes = assign(xr, codebooks)
      objectives += err(xr, reconstruct(codes, codebooks))
      t += 1
    }
    Result(Array.tabulate(d, d)((i, j) => r(i, j)).map(_.toArray),
      codebooks, objectives.toSeq)
  }

  /** A deterministic dense orthogonal d×d mixer (QR of an LCG-filled
    * matrix — no RNG state, same Q every run): pre-rotating a corpus by
    * it simulates the inter-dimension correlation real embedding models
    * emit, the geometry OPQ exists to undo (GenScale's own dims are
    * independent by construction). Row-vector convention, like the
    * trained rotation.
    */
  def mixer(d: Int): Array[Array[Double]] = {
    import breeze.linalg.{DenseMatrix, qr}
    var seed = 0x9e3779b97f4a7c15L
    def next(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val a = DenseMatrix.tabulate(d, d)((_, _) => next())
    val q = qr(a).q
    Array.tabulate(d, d)((i, j) => q(i, j)).map(_.toArray)
  }

  /** ‖RᵀR − I‖max — the orthogonality defect the gate thresholds. */
  def orthDefect(r: Array[Array[Double]]): Double = {
    val d = r.length
    var worst = 0.0
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var s = 0.0; var t = 0
        while (t < d) { s += r(t)(i) * r(t)(j); t += 1 }
        val want = if (i == j) 1.0 else 0.0
        worst = math.max(worst, math.abs(s - want))
        j += 1
      }
      i += 1
    }
    worst
  }
}
