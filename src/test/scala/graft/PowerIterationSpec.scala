package graft

import graft.operators.PowerIteration

/** Property gates for the distributed power-iteration PCA trainer —
  * the KMeansSpec discipline: float reductions are not bit-stable
  * cross-engine, so the operator is pinned by recovered-structure
  * properties instead of a SQL oracle. */
class PowerIterationSpec extends SparkSuite {

  private val Dim = 8

  test("power iteration recovers a planted dominant direction") {
    import spark.implicits._
    // planted unit direction u; corpus x_i = s_i·u + deterministic
    // small noise, s_i sweeping -10..10 — the top eigenvector of the
    // covariance is u up to sign, with eigenvalue ≈ E[s²] ≈ 36.7
    val u0 = Array(3.0, -1.0, 2.0, 0.5, -2.5, 1.5, -0.5, 1.0)
    val u = { val n = math.sqrt(u0.map(x => x * x).sum); u0.map(_ / n) }
    val rows = (0 until 400).map { i =>
      val s = ((i % 21) - 10).toDouble
      Tuple1(Array.tabulate(Dim)(d =>
        (s * u(d) + 0.05 * math.sin(i * 0.7 + d * 1.3)).toFloat))
    }
    val df = rows.toDF("embedding").repartition(8)

    val res = PowerIteration.topComponent(df, iters = 12, dim = Dim).head()
    val v = res.getAs[Seq[Double]]("component").toArray
    val lambda = res.getAs[Double]("eigenvalue")

    // unit norm, alignment with the planted direction (sign-free), and
    // a Rayleigh estimate in the planted-variance ballpark
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9, s"norm=$norm")
    val cos = v.zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.99, s"cos=$cos component=${v.toSeq}")
    assert(lambda > 20.0 && lambda < 60.0, s"eigenvalue=$lambda")
  }

  test("more iterations do not drift a converged component") {
    import spark.implicits._
    val rows = (0 until 120).map { i =>
      val s = ((i % 11) - 5).toDouble
      Tuple1(Array.tabulate(Dim)(d =>
        (s * (if (d == 2) 1.0 else 0.0) +
          0.02 * math.cos(i * 1.1 + d)).toFloat))
    }
    val df = rows.toDF("embedding").repartition(4)
    def comp(iters: Int): Array[Double] =
      PowerIteration.topComponent(df, iters, Dim).head()
        .getAs[Seq[Double]]("component").toArray
    val a = comp(8)
    val b = comp(12)
    // sign-aligned L2 distance between the two runs' components
    val sign = if (a.zip(b).map { case (x, y) => x * y }.sum < 0) -1.0 else 1.0
    val d2 = a.zip(b).map { case (x, y) => (x - sign * y) * (x - sign * y) }.sum
    assert(d2 < 1e-8, s"converged component drifted: d2=$d2")
  }
}
