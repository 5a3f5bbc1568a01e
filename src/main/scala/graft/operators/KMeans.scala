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
  *     a row_number window — one pass, no shuffle of the corpus beyond
  *     the k-way fan-in of the window partition key (vec_id);
  *  2. recompute: posexplode the assigned vectors, mean per
  *     (cell, dim) — a map-side-combinable aggregate — then reassemble
  *     each centroid with an order-pinned sort_array(collect_list).
  *
  * Nothing driver-side but the loop counter: centroids live in a
  * DataFrame between supersteps (they are k rows — broadcast-sized by
  * construction). Empty cells inherit their previous centroid (standard
  * Lloyd's degenerate-cell handling, keeps k stable). Init is
  * deterministic (first k vec_ids); the per-dim means are floating-
  * point reductions whose partial-merge order Spark does not pin, so
  * centroids are reproducible only up to last-ulp noise — argmin
  * assignments are stable because cell separation dwarfs ulp, which is
  * why the ORACLE-gated IVF queries use exact stand-in centroids and
  * this trainer is recall-gated instead.
  */
object KMeans {

  /** Train k centroids; returns (c_id, c_emb: array<float>). */
  def train(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, s"k=$k iters=$iters")
    val e = embeddings.select(col("vec_id"), col("embedding"))
    var cents = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
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
      // empty cells keep their previous centroid
      cents = cents.as("old")
        .join(means.as("new"), Seq("c_id"), "left_outer")
        .select(col("c_id"),
          coalesce(col("new.c_emb"), col("old.c_emb")).as("c_emb"))
    }
    cents
  }

  /** Nearest-centroid assignment: (vec_id, embedding, c_id). */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d2 = expr(
      "aggregate(zip_with(embedding, c_emb, (a, b) -> CAST((a - b) * (a - b) AS double)), CAST(0.0 AS double), (acc, x) -> acc + x)")
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("c_id"))
    vectors.crossJoin(broadcast(centroids))
      .withColumn("d2", d2)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(vectors.columns.map(col) :+ col("c_id"): _*)
  }
}
