package graft

import graft.queries.CurationQueries
import org.apache.spark.sql.functions._

/** Properties of the priority-sampling operator
  * (CurationQueries.prioritySample, Duffield–Lund–Thorup) — the DuckDB
  * oracle gate pins cross-engine value equality; these pin the
  * statistical and structural promises: inclusion probability grows
  * with weight, strata sample independently, k bounds every stratum,
  * and membership is deterministic across runs. */
class WeightedSampleSpec extends SparkSuite {

  private def frame(rows: Seq[(String, Long, Long)]) =
    spark.createDataFrame(rows).toDF("lang", "doc_id", "n_chars")

  test("weight dominates inclusion: 100x-heavy docs crowd out light ones") {
    // one stratum, 20 heavy docs (w=10000) among 180 light (w=100).
    // Priority = w/u with u uniform: a heavy doc's priority
    // stochastically dominates a light doc's 100:1 — with k=10 the
    // expected heavy share of the sample is near-total. Deterministic
    // hash coin, so this is a fixed fact about salt 37, not a flaky
    // draw; the margin (>=8 of 10) survives any unlucky grid spots.
    val rows = (1L to 200L).map(i =>
      ("en", i, if (i <= 20) 10000L else 100L))
    val got = CurationQueries.prioritySample(frame(rows), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.size == 10)
    val heavy = got.count(_ <= 20L)
    assert(heavy >= 8, s"heavy docs must dominate the sample, got $heavy/10: $got")
  }

  test("per-stratum k bound and independence across strata") {
    val rows = (1L to 50L).map(i => ("en", i, 100L)) ++
      (51L to 53L).map(i => ("zh", i, 100L))
    val got = CurationQueries.prioritySample(frame(rows), 5)
      .groupBy("lang").agg(count(lit(1)).as("n"), max("rk").as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("en") == ((5L, 5L)), s"en must fill k=5: $got")
    assert(got("zh") == ((3L, 3L)), s"a 3-doc stratum yields all 3: $got")
  }

  test("deterministic: two independent runs select identical members") {
    val rows = (1L to 300L).map(i => ("en", i, 50L + (i % 7) * 100L))
    def run() = CurationQueries.prioritySample(frame(rows), 12)
      .orderBy("lang", "rk").collect().toSeq
    assert(run() == run())
  }

  test("ranks are dense 1..k and priorities non-increasing within a stratum") {
    val rows = (1L to 100L).map(i => ("de", i, 10L + i))
    val got = CurationQueries.prioritySample(frame(rows), 10)
      .orderBy("rk").collect()
      .map(r => (r.getLong(4), r.getLong(3)))
    assert(got.map(_._1).toSeq == (1L to 10L), s"ranks must be dense: ${got.toSeq}")
    val prios = got.map(_._2)
    assert(prios.zip(prios.tail).forall { case (a, b) => a >= b },
      s"priority must be non-increasing in rank: ${prios.toSeq}")
  }
}
