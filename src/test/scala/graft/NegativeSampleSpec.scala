package graft

import org.apache.spark.sql.functions._

/** Properties of contrastive negative mining (`negative_sample`) — the
  * DuckDB oracle pins cross-engine values; these pin the contract that
  * makes the sample USABLE as contrastive negatives: disjointness from
  * the anchor's true neighborhood (false-negative poisoning guard),
  * per-anchor k, and anchor-decorrelated draws. */
class NegativeSampleSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("negatives never collide with the anchor's brute-force top-k or itself") {
    val pos = SparkEntry.queries("ann_bruteforce")(spark, dir)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val neg = SparkEntry.queries("negative_sample")(spark, dir)
      .select(col("q_id"), col("neg_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(neg.nonEmpty)
    val poisoned = neg.filter(p => pos.contains(p) || p._1 == p._2)
    assert(poisoned.isEmpty,
      s"negatives must avoid true positives and the anchor: ${poisoned.toSeq}")
  }

  test("every anchor gets exactly k negatives with dense ranks") {
    val got = SparkEntry.queries("negative_sample")(spark, dir)
      .groupBy("q_id").agg(count(lit(1)).as("n"), max("rk").as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.length == 8, s"8 anchors expected: ${got.toSeq}")
    assert(got.forall(_ == ((4L, 4L))), s"k=4 dense per anchor: ${got.toSeq}")
  }

  test("draws are anchor-keyed: no two anchors share an identical negative set") {
    val sets = SparkEntry.queries("negative_sample")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }
    assert(sets.values.toSeq.distinct.size == sets.size,
      s"hash is per (anchor, candidate), so sets must differ: $sets")
  }
}
