package graft

import org.apache.spark.sql.functions._

/** Invariants of the T5 span-corruption mask planner
  * (`span_corruption`) — the DuckDB oracle pins cross-engine values;
  * these pin the objective's shape: the realized corruption rate lands
  * in the T5 band, per-doc counts are structurally consistent, and the
  * plan is deterministic (the property that makes restarted
  * preprocessing mask identical spans). */
class SpanCorruptionSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("realized corruption rate sits in the T5 band, spans average ~3 tokens") {
    val r = SparkEntry.queries("span_corruption")(spark, dir)
      .agg(sum("n_masked").as("m"), sum("n_tokens").as("t"), sum("n_spans").as("s"))
      .collect()(0)
    val (m, t, sp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val rate = m.toDouble / t
    assert(rate > 0.10 && rate < 0.20, s"corruption rate $rate outside the T5 band")
    val meanLen = m.toDouble / sp
    assert(meanLen > 2.0 && meanLen < 4.5, s"mean merged-span length $meanLen")
  }

  test("per-doc structure: 0 <= n_spans <= n_masked <= n_tokens") {
    val bad = SparkEntry.queries("span_corruption")(spark, dir)
      .filter(!(col("n_spans") >= 0 && col("n_spans") <= col("n_masked") &&
        col("n_masked") <= col("n_tokens")))
      .count()
    assert(bad == 0L, s"$bad docs violate the span-count ordering")
  }

  test("the mask plan is deterministic across runs") {
    def run() = SparkEntry.queries("span_corruption")(spark, dir)
      .orderBy("doc_id").collect().toSeq
    assert(run() == run())
  }
}
