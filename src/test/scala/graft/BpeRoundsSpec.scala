package graft

import graft.queries.TextQueries

/** Pins the R=50 BPE training loop's scale contract: the checkpoint
  * cadence holds the logical-plan depth CONSTANT across rounds, so
  * per-round cost is the vocab-sized pair-count job — not O(r)
  * re-analysis of an r-deep bpeApplyMerge select chain (cost model in
  * SCALE.md §bpe). Lineage is the deterministic proxy asserted here;
  * wall-time flatness follows from it and is not timed (CI noise). */
class BpeRoundsSpec extends SparkSuite {

  test("R=50 training: lineage bounded by cadence, merges monotone, compounded") {
    val probes = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val (rows, _) = TextQueries.bpeTrain(spark, "/root/testdata/sf0.001",
      applyLast = false, onRound = (r, n) => probes += ((r, n)))
    spark.catalog.clearCache()

    assert(rows.size == 50, s"expected 50 merge rounds, got ${rows.size}")
    // counts non-increasing and compounding are require()d inside
    // bpeTrain; re-assert the headline here so a contract change there
    // cannot silently weaken this spec
    assert(rows.sliding(2).forall {
      case Seq(a, b) => b._3 <= a._3
      case _ => true
    }, "merge counts must be non-increasing")
    assert(rows.exists(_._2.split(' ').exists(_.length > 1)),
      "R=50 must reach compounded merges")

    // the lineage contract: plan node count NEVER grows past the
    // cadence window — each checkpoint round collapses it to a
    // LogicalRDD, and between checkpoints it grows by one Project per
    // round on top of the initial tokenize chain
    val maxNodes = probes.map(_._2).max
    assert(maxNodes <= 32,
      s"plan lineage escaped the cadence bound (max $maxNodes nodes): $probes")
    val atCadence = probes.filter(_._1 % 8 == 0)
    assert(atCadence.nonEmpty && atCadence.forall(_._2 <= 4),
      s"cadence rounds must collapse lineage to a LogicalRDD: $atCadence")
    // and growth between checkpoints restarts from the collapsed plan,
    // i.e. round 9's plan is smaller than round 7's chain-on-chain
    val late = probes.filter(p => p._1 > 8 && p._1 % 8 != 0).map(_._2).max
    val earlyChain = probes.filter(_._1 <= 7).map(_._2).max
    assert(late <= earlyChain,
      s"post-checkpoint chains must not exceed the initial chain: $probes")
  }
}
