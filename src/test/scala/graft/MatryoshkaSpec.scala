package graft

/** Invariants of the `embedding_matryoshka` truncation audit that hold
  * on ANY corpus (the oracle gate pins cross-engine equality; these pin
  * the audit's internal consistency on real sf0.001 data):
  *  - the full-width row (dim = 64) is a tautology — slicing to the
  *    full width must reproduce bruteTopK exactly, so recall is TopK/
  *    TopK and the summed cosine shift is zero; any drift means the
  *    sliced brute pass's arithmetic diverged from the truth pass's;
  *  - every (dim, query) cell is present and hits stay in [0, TopK];
  *  - monotonicity is NOT asserted (recall@32 < recall@16 is possible
  *    on adversarial geometry) — only the self-consistency facts. */
class MatryoshkaSpec extends SparkSuite {

  test("full-width truncation row is exact: recall TopK/TopK, zero cosine shift") {
    val fn = graft.queries.SimilarityQueries.defs
      .find(_.name == "embedding_matryoshka").get.fn
    val rows = fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val dims = rows.map(_._1).distinct.sorted
    assert(dims.sameElements(Array(16L, 32L, 64L)), dims.mkString(","))
    assert(rows.length == dims.length * 8, s"8 queries x ${dims.length} dims: ${rows.length}")
    rows.filter(_._1 == 64L).foreach { case (_, q, hits, loss) =>
      assert(hits == 5L, s"full-width recall must be 5/5 for q=$q, got $hits")
      assert(loss == 0L, s"full-width cosine shift must be 0 for q=$q, got $loss")
    }
    assert(rows.forall(r => r._3 >= 0L && r._3 <= 5L), "hits within [0, TopK]")
    // the truncations must actually bite on this corpus (degenerate
    // all-5s would mean the slice silently no-ops)
    assert(rows.filter(_._1 < 64L).exists(_._3 < 5L),
      "some truncated query must lose a neighbor on random 64-d data")
  }
}
