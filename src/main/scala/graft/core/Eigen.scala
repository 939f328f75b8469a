package graft.core

/** Cyclic-Jacobi eigendecomposition of a small dense symmetric
  * matrix — the driver-side "model fit" that consumes qe23's Gram /
  * second-moment matrix (a 64×64 = kilobyte object; every model fit
  * in this engine happens off-cluster at exactly this scale, cf.
  * Ivf/Pq/Sq trainers). Jacobi is the right algorithm here: simple,
  * unconditionally convergent for symmetric input, and accurate to
  * machine precision on the well-conditioned covariance matrices the
  * rotation path feeds it — no external linear-algebra dependency.
  */
object Eigen {

  /** Eigendecompose symmetric `a0` (not mutated). Returns
    * (eigenvalues, eigenvectors-as-ROWS), sorted by eigenvalue
    * DESCENDING — so `out._2(i)` is the unit eigenvector of the
    * i-th largest eigenvalue and the matrix of rows is the rotation
    * that maps a vector onto the eigenbasis (y_i = rowᵢ · x).
    * Deterministic: fixed cyclic sweep order, sign convention
    * "largest-|component| coordinate is positive" (eigenvectors are
    * only defined up to sign; pinning it keeps rotated artifacts
    * reproducible across JVMs).
    */
  def symmetric(a0: Array[Array[Double]],
                maxSweeps: Int = 32,
                tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    val scale = math.max(1e-300,
      a0.map(r => r.map(math.abs).max).max)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol * scale) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            off = math.max(off, math.abs(apq))
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // A ← JᵀAJ on rows/cols p,q (symmetric update)
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            // V ← V·J (columns p,q)
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // columns of v are eigenvectors; sort by eigenvalue desc with a
    // deterministic index tiebreak, emit as rows, pin the sign
    val order = (0 until n)
      .sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val rows = order.map { i =>
      val row = Array.tabulate(n)(k => v(k)(i))
      val m = row.indices.maxBy(k => (math.abs(row(k)), -k))
      if (row(m) < 0) row.map(x => -x) else row
    }.toArray
    (vals, rows)
  }
}
