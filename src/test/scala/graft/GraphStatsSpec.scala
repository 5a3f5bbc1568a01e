package graft

import graft.queries.{DedupQueries, SimilarityQueries}
import org.apache.spark.sql.functions._

/** Pins the graph-cohesion and dedup-eval operators: triangle/wedge
  * counting on planted graphs with known answers, and the LSH recall
  * eval's agreement with independently computed ground truth.
  */
class GraphStatsSpec extends SparkSuite {

  private def stats(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    val und = edges.toDF("u", "v")
    SimilarityQueries.triangleStats(und).collect()(0)
  }

  test("planted 4-clique: C(4,3)=4 triangles, transitivity 1") {
    val clique = for { a <- 0L to 3L; b <- (a + 1) to 3L } yield (a, b)
    val r = stats(clique)
    assert(r.getLong(0) == 4 && r.getLong(1) == 6) // nodes, edges
    assert(r.getLong(2) == 12) // wedges: 4 nodes × C(3,2)
    assert(r.getLong(3) == 4) // triangles
    assert(r.getLong(4) == 1000000L) // 3·4/12 = 1.0
  }

  test("planted path graph: zero triangles, wedges from interior nodes") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val r = stats(path)
    assert(r.getLong(3) == 0)
    assert(r.getLong(2) == 2) // two interior degree-2 nodes
    assert(r.getLong(4) == 0)
  }

  test("triangle with a tail: one triangle, transitivity below 1") {
    val g = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L))
    val r = stats(g)
    assert(r.getLong(3) == 1)
    // degrees: 2,2,3,1 → wedges 1+1+3+0 = 5; closure = 3/5
    assert(r.getLong(2) == 5)
    assert(r.getLong(4) == 600000L)
  }

  test("hubness_indegree conserves nodes and edges, restores anti-hubs") {
    val dir = "/root/testdata/sf0.001"
    val hist = SimilarityQueries.defs.find(_.name == "hubness_indegree").get
      .fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    spark.catalog.clearCache()
    val edges = SimilarityQueries.defs.find(_.name == "knn_graph").get
      .fn(spark, dir).count()
    spark.catalog.clearCache()
    val nVec = spark.read.parquet(s"$dir/embeddings.parquet").count()
    // every vector owns exactly one histogram slot (anti-hubs restored)
    assert(hist.map(_._2).sum == nVec, hist.mkString(","))
    // Σ in_deg · n_nodes = |edges|: each edge lands in one dst's count
    assert(hist.map(t => t._1 * t._2).sum == edges, hist.mkString(","))
    // the anti-hub bucket is non-empty on this corpus — the tail the
    // histogram exists to expose (and a bare edge groupBy would drop)
    assert(hist.exists(t => t._1 == 0L && t._2 > 0L), hist.mkString(","))
    // per-mille shares floor-sum to ≤ 1000
    assert(hist.map(_._3).sum <= 1000L)
  }

  test("dedup_lsh_eval agrees with independently measured recall") {
    val dir = "/root/testdata/sf0.001"
    val eval = DedupQueries.defs.find(_.name == "dedup_lsh_eval").get
      .fn(spark, dir).collect()(0)
    spark.catalog.clearCache()
    val truth = DedupQueries.allPairsJaccard(spark, dir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(eval.getLong(0) == truth.size, "n_true must equal brute-force pair count")
    assert(eval.getLong(1) <= eval.getLong(0))
    assert(eval.getLong(2) >= 900000L, s"LSH recall ${eval.getLong(2)} ppm suspiciously low")
  }
}
