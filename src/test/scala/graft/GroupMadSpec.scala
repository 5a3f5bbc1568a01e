package graft

import graft.queries.ProfilingQueries

/** Parity and rank arithmetic of the histogram median read-off
  * (ProfilingQueries.histMedian) that `group_mad` builds on — the
  * DuckDB oracle gate pins cross-engine equality on real data; these
  * pin the quantile_cont(0.5) contract on constructed histograms where
  * the right answer is computable by hand for both parities and under
  * heavily skewed counts (the regime where a rank off-by-one hides on
  * uniform data). */
class GroupMadSpec extends SparkSuite {

  private def median(rows: Seq[(String, Double, Long)]): Map[String, Double] =
    ProfilingQueries.histMedian(
      spark.createDataFrame(rows).toDF("g", "v", "c"), "g")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("odd n picks the exact middle element") {
    // g=a: values 1,2,3 once each -> median 2
    // g=b: 5 ones, 1 nine -> n=6? no: counts 5+1=6 even; use 5+2=7 odd
    val r = median(Seq(
      ("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 1L),
      ("b", 1.0, 5L), ("b", 9.0, 2L)))
    assert(r("a") == 2.0, s"got $r")
    assert(r("b") == 1.0, s"rank 4 of 7 sits in the ones run: $r")
  }

  test("even n averages the two middle elements, within and across values") {
    // g=a: 1,1,3,3 -> middles 1 and 3 -> 2.0 (across-value straddle)
    // g=b: 2,2,2,8 -> middles 2 and 2 -> 2.0 (within one value's run)
    val r = median(Seq(
      ("a", 1.0, 2L), ("a", 3.0, 2L),
      ("b", 2.0, 3L), ("b", 8.0, 1L)))
    assert(r("a") == 2.0, s"got $r")
    assert(r("b") == 2.0, s"got $r")
  }

  test("skewed counts: one heavy value dominates the rank walk") {
    // 1000 copies of 7 surrounded by single outliers; median must be 7
    val r = median(Seq(
      ("a", 0.5, 1L), ("a", 7.0, 1000L), ("a", 99.0, 3L)))
    assert(r("a") == 7.0, s"got $r")
  }

  test("single-value group and single-row group") {
    val r = median(Seq(("a", 4.5, 17L), ("b", 8.25, 1L)))
    assert(r("a") == 4.5 && r("b") == 8.25, s"got $r")
  }
}
