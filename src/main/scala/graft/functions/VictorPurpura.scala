package graft.functions

/** Victor-Purpura spike-train distance (reference:
  * external/bluecv/comparison.py:17-21 via elephant): minimal cost to
  * transform one spike train into another with unit insert/delete cost and
  * move cost q·|Δt| — an edit-distance dynamic program, O(n·m) with
  * sequential row dependencies. This is genuinely imperative (SURVEY §7.3:
  * the UDF tier is the right home — a relational encoding would need an
  * iterative self-join per DP row), so it ships as a plain Scala kernel
  * used from a UDF over collected per-train arrays; trains are per-gid
  * arrays, bounded by the cohort selection, so the quadratic cost is local
  * to a task and never shuffles.
  */
object VictorPurpura {

  def distance(a: Array[Double], b: Array[Double], q: Double): Double = {
    val (n, m) = (a.length, b.length)
    if (n == 0) return m.toDouble
    if (m == 0) return n.toDouble
    var prev = Array.tabulate(m + 1)(_.toDouble)
    var cur = new Array[Double](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i.toDouble
      var j = 1
      while (j <= m) {
        val move = prev(j - 1) + q * math.abs(a(i - 1) - b(j - 1))
        val del = prev(j) + 1.0
        val ins = cur(j - 1) + 1.0
        cur(j) = math.min(move, math.min(del, ins))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}
