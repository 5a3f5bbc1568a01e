package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed power iteration for the TOP PRINCIPAL COMPONENT of an
  * embedding column — the spectral sibling of [[KMeans]]: where k-means
  * summarizes a representation by cells, the leading eigenvector of the
  * covariance says whether the space is collapsing onto one axis
  * (anisotropy — the known failure mode of contrastive embedding
  * training) and is the projection PCA whitening removes first.
  * Like the k-means trainer it is recall/property-gated in ScalaTest
  * rather than SQL-oracled: per-dim float means are not bit-stable
  * across engines (the same reason `ann_ivf*` use exact stand-in
  * centroids).
  *
  * Superstep shape, per iteration (the 100 TB argument):
  *  1. score: corpus ⨯ broadcast(1-row state) — each vector's centered
  *     projection t = (x − μ)·v is a codegen'd fold, no shuffle;
  *  2. accumulate: w = Σ t·(x − μ) via posexplode + per-dim SUM — a
  *     map-side-combinable aggregate whose exchange carries |dims|
  *     partial rows per task, never vectors;
  *  3. normalize: reassemble the |dims|-entry array in ONE 1-row frame
  *     (sort_array(collect_list) — the KMeans reassembly idiom) and
  *     divide by its L2 norm.
  *
  * State between supersteps is a 1-row DataFrame (v, its Rayleigh
  * estimate) materialized by an eager localCheckpoint — same lineage
  * discipline as KMeans: un-checkpointed, iteration i's plan would
  * contain ~2^i copies of the scan subtree. The only driver-side
  * values are the loop counter and one corpus count (the Rayleigh
  * denominator) — vectors never leave the executors.
  *
  * Init is the deterministic all-ones direction; convergence to the
  * dominant eigenvector needs only a nonzero projection on it, and the
  * property spec plants data where that holds. The Rayleigh quotient
  * λ = ‖Σ t·(x−μ)‖ / n (for unit v, = vᵀCv at the fixpoint) rides
  * along as the eigenvalue estimate.
  */
object PowerIteration {

  /** Leading principal component of `embeddings.embedding`
    * (array&lt;float&gt; or array&lt;double&gt;). Returns a 1-row frame
    * `(component: array&lt;double&gt;, eigenvalue: double)`; `iters`
    * supersteps, each one corpus pass. */
  def topComponent(embeddings: DataFrame, iters: Int, dim: Int): DataFrame = {
    require(iters >= 1 && dim >= 1, s"iters=$iters dim=$dim")
    val spark = embeddings.sparkSession
    val e = embeddings.select(col("embedding"))

    // per-dim mean — one map-side-combinable agg, reassembled to a
    // 1-row array frame (broadcast-sized by construction)
    val mu = e.select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(avg(col("x")).as("m"))
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(expr("transform(pm, s -> s.m)").as("mu"))
      .localCheckpoint()

    val n = e.count().toDouble
    require(n >= 2, s"need at least 2 vectors, got $n")

    import spark.implicits._
    var state = Seq(Tuple1(Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))))
      .toDF("component")

    for (_ <- 0 until iters) {
      val c = expr("zip_with(embedding, mu, (a, b) -> CAST(a AS double) - b)")
      val t = expr("aggregate(zip_with(c, component, (x, y) -> x * y), " +
        "CAST(0.0 AS double), (acc, x) -> acc + x)")
      val w = e.crossJoin(broadcast(mu)).crossJoin(broadcast(state))
        .select(c.as("c"), col("component"))
        .select(col("c"), t.as("t"))
        .select(col("t"), posexplode(col("c")).as(Seq("pos", "x")))
        .groupBy(col("pos")).agg(sum(col("x") * col("t")).as("w"))
        .agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("pw"))
        .select(expr("transform(pw, s -> s.w)").as("w"))
      state = w
        .select(col("w"),
          sqrt(expr("aggregate(transform(w, x -> x * x), CAST(0.0 AS double), " +
            "(acc, x) -> acc + x)")).as("nrm"))
        .select(expr("transform(w, x -> x / nrm)").as("component"),
          (col("nrm") / lit(n)).as("eigenvalue"))
        .localCheckpoint() // eager: 1 row, pins the superstep snapshot
    }
    state
  }
}
