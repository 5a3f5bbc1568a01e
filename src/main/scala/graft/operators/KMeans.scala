package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the trainer
  * for IVF coarse quantizers (`ann_ivf*` use a deterministic stand-in
  * as the driver-gated query because float means are not bit-stable
  * across engines; THIS is the machinery a real pipeline runs, gated by
  * recall tests instead of a SQL oracle).
  *
  * Superstep shape, per iteration:
  *  1. assign: corpus ⨯ broadcast(centroids), argmin by squared L2 via
  *     a map-side-combinable `min_by` aggregate — the shuffle carries
  *     |corpus| rows (one per vector, k-way combined on the map side),
  *     NOT the |corpus|·k crossJoin output a window-argmin would move;
  *  2. recompute: posexplode the assigned vectors, mean per
  *     (cell, dim) — a map-side-combinable aggregate — then reassemble
  *     each centroid with an order-pinned sort_array(collect_list).
  *
  * Nothing driver-side but the loop counter: centroids live in a
  * DataFrame between supersteps (they are k rows — broadcast-sized by
  * construction) and are MATERIALIZED each iteration via an eager
  * localCheckpoint. That cuts the lineage, so (a) the plan does not
  * double per superstep (the previous `cents` is referenced by both the
  * assign side and the empty-cell outer join — un-checkpointed, that is
  * ~2^iters copies of the initial subplan), and (b) the two consumers
  * see ONE evaluated snapshot, not two independent recomputations of an
  * order-nondeterministic float AVG that could disagree at the ulp
  * level within a single iteration. Empty cells inherit their previous
  * centroid (standard Lloyd's degenerate-cell handling, keeps k
  * stable). Init is deterministic (first k vec_ids); per-dim means are
  * floating-point reductions whose partial-merge order Spark does not
  * pin, so centroids are reproducible only up to last-ulp noise —
  * argmin assignments are stable because cell separation dwarfs ulp,
  * which is why the ORACLE-gated IVF queries use exact stand-in
  * centroids and this trainer is recall-gated instead.
  */
object KMeans {

  /** Train k centroids; returns (c_id, c_emb: array<float>). */
  def train(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, s"k=$k iters=$iters")
    val e = embeddings.select(col("vec_id"), col("embedding"))
    var cents = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      .localCheckpoint() // eager: k rows, pins the init snapshot
    // AQE stays ON in the loop — the bpeTrain AQE-off precedent was
    // tried in r18 and REJECTED here: unlike BPE's vocab-sized rounds,
    // each Lloyd iteration mixes a CORPUS-sized exchange (the assign
    // argmin) with k-row ones, so no single conf width suits the loop,
    // and with AQE off the k-row aggregations ran shuffle.partitions
    // wide (measured slower at sf0.1 than AQE's extra per-stage jobs).
    for (_ <- 0 until iters) {
      val assigned = assign(e, cents)
      val means = assigned
        .select(col("c_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("c_id"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("c_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("c_id"),
          expr("transform(pm, x -> CAST(x.m AS float))").as("c_emb"))
      // empty cells keep their previous centroid; eager localCheckpoint
      // materializes the k-row result so the next superstep starts from
      // a snapshot, not a growing recursive plan
      cents = cents.as("old")
        .join(means.as("new"), Seq("c_id"), "left_outer")
        .select(col("c_id"),
          coalesce(col("new.c_emb"), col("old.c_emb")).as("c_emb"))
        .localCheckpoint()
    }
    cents
  }

  /** Nearest-centroid assignment: (vec_id, embedding, c_id).
    *
    * argmin via `min_by(c_id, (d2, c_id))` — map-side combinable, so
    * each map task reduces its k candidates per vector locally and the
    * exchange moves |corpus| rows; the struct ordering key makes ties
    * deterministic (lowest c_id wins, matching the window form this
    * replaced). Non-key columns ride along via any_value — constant
    * within a vec_id group, so the choice is value-deterministic.
    */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val d2 = expr(
      "aggregate(zip_with(embedding, c_emb, (a, b) -> CAST((a - b) * (a - b) AS double)), CAST(0.0 AS double), (acc, x) -> acc + x)")
    val carried = vectors.columns.filter(_ != "vec_id").toSeq
    vectors.crossJoin(broadcast(centroids))
      .withColumn("d2", d2)
      .groupBy(col("vec_id"))
      .agg(
        min_by(col("c_id"), struct(col("d2"), col("c_id"))).as("c_id"),
        carried.map(c => any_value(col(c)).as(c)): _*)
      .select(vectors.columns.map(col) :+ col("c_id"): _*)
  }
}
