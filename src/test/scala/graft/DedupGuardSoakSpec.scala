package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Scale-soak for the dedup guards. The df-cap, the semantic hot-cell
  * guard, and the cluster-propagation convergence cap are all no-ops on
  * the well-behaved testdata BY DESIGN — which means nothing in the
  * driver gate ever proves they fire. This spec builds deliberately
  * pathological inputs (planted boilerplate shingles, a fully clumped
  * embedding corpus, an over-diameter near-dup chain) and asserts each
  * guard actually prunes or throws, plus a healthy control for each so
  * the guards are shown to be selective, not trigger-happy.
  */
class DedupGuardSoakSpec extends SparkSuite {

  import spark.implicits._

  test("df-cap prunes planted hot shingles and keeps everything else") {
    // 2000 docs: each carries one unique shingle, ALL carry the same
    // boilerplate shingle (df = 2000), and the first 100 share a
    // mid-frequency one (df = 100 — exactly the floor, must survive:
    // the cap is strictly-greater). thr = max(ceil(0.001*2000), 100) = 100.
    val sh = spark.range(2000).select(col("id").as("doc_id"))
      .select(col("doc_id"), explode(array(
        concat(lit("unique "), col("doc_id")),
        lit("the planted boilerplate"),
        when(col("doc_id") < 100, lit("mid frequency shingle"))
          .otherwise(concat(lit("filler "), col("doc_id"))))).as("s"))
      .filter(col("s").isNotNull)
    val capped = DedupQueries.dfCap(sh, maxDfFrac = 0.001)
    val bySh = capped.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySh.contains("the planted boilerplate"),
      "hot shingle (df=2000 > thr=100) must be pruned")
    assert(bySh.get("mid frequency shingle").contains(100L),
      "floor-exact shingle (df=100, not > 100) must survive")
    assert(bySh.count(_._1.startsWith("unique ")) == 2000,
      "df=1 shingles must all survive")
    // the pruned set is exactly input minus the hot shingle's postings
    assert(capped.count() == sh.count() - 2000)
  }

  test("hot-cell guard throws on a clumped corpus, passes a spread one") {
    val dim = 8
    def writeEmb(name: String, clumped: Boolean): String = {
      val dir = tmpDir(name)
      val n = 8200
      spark.range(n).select(col("id").as("vec_id"))
        .withColumn("embedding", (
          if (clumped)
            // every vector identical → every vector lands in cell 0:
            // the |cell|² self-join would be all-pairs
            array((0 until dim).map(i => lit(1.0f / (i + 1))): _*)
          else
            // vec_id-keyed one-hot-ish spread: vectors split across
            // directions, so frozen first-k centroids fan them out
            array((0 until dim).map(i =>
              (when(pmod(col("vec_id"), lit(dim)) === i, lit(1.0f))
                .otherwise(lit(0.01f)) +
                // small deterministic jitter breaks exact ties
                (pmod(col("vec_id") * 31 + i * 17, lit(97)).cast("float") / 10000f))): _*)
          ).cast("array<float>"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }
    // rows=8200, targetRows=64 → k=129, balanced expectation 64/cell,
    // bound max(64·64, 4096) = 4096 — the clump (8200 in one cell) is
    // over, a spread corpus is far under
    val clumped = writeEmb("soak_clumped", clumped = true)
    val e = intercept[IllegalStateException] {
      DedupQueries.semanticDropsFrozen(spark, clumped, tau = 0.9, targetRows = 64L)
    }
    assert(e.getMessage.contains("hot cell"), e.getMessage)
    val spreadDir = writeEmb("soak_spread", clumped = false)
    try {
      val (assigned, _, k) =
        DedupQueries.semanticDropsFrozen(spark, spreadDir, tau = 0.9, targetRows = 64L)
      assert(k == 129)
      // guard passed AND the corpus is genuinely multi-cell
      assert(assigned.select(countDistinct(col("c_id"))).first().getLong(0) > 1)
    } finally spark.catalog.clearCache()
  }

  test("cluster propagation: short chains converge plainly, long ones via pointer doubling, cap still throws") {
    // 10-node path graph: diameter 9 — plain neighbor-min converges
    // inside ShortcutAfter-adjacent territory, one cluster labeled by
    // its minimum
    val short = (0L until 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = DedupQueries.propagateMinLabels(short).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 10 && labels.values.forall(_ == 0L), labels)
    // 60-node chain (diameter 59 ≫ the 20-superstep cap): plain
    // propagation alone could never finish — convergence at the
    // DEFAULT cap proves the adaptive pointer doubling actually
    // compresses paths (O(log diameter) once it switches on)
    val long = (0L until 59L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val ok = DedupQueries.propagateMinLabels(long).collect()
      .map(r => r.getLong(1)).toSet
    assert(ok == Set(0L), s"pointer doubling failed to converge a 60-chain: $ok")
    // the cap guard still fires: below the doubling threshold a
    // too-small budget must THROW (silent wrong cluster_ids are the
    // failure mode it exists to prevent)
    val e = intercept[IllegalStateException] {
      DedupQueries.propagateMinLabels(long, maxIter = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
  }
}
