package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Property checks for the winnowing duplicate-span audit
  * (DedupQueries.winnowingAudit) — cross-engine value equality is the
  * DuckDB oracle gate's job; these pin the guarantees the algorithm
  * promises (Schleimer et al. 2003): any verbatim shared region of at
  * least K+W−1 chars surfaces a common fingerprint REGARDLESS of its
  * offset in either doc, and sub-threshold docs degrade to empty
  * fingerprint sets rather than inverted `sequence` ranges. */
class WinnowingSpec extends SparkSuite {

  private def minSpan = DedupQueries.WinnowK + DedupQueries.WinnowW - 1 // 31

  private def audit(docs: (Long, String)*) = {
    val out = DedupQueries.winnowingAudit(
      spark.createDataFrame(docs).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    spark.catalog.clearCache() // release winnowingAudit's fp persist
    out
  }

  test("a shared span of K+W-1 chars is caught at ANY offset pair") {
    // the span sits at offset 0 in doc 1, offset 17 in doc 2, offset 5
    // in doc 3 — alignment-free, unlike strided sampling. Doc 4 shares
    // nothing. Alphabets are disjoint so no accidental gram collisions.
    val span = "Q" * 3 + "WERTYUIOPASDFGHJKLZXCVBNM" + "Q" * 3
    assert(span.length == minSpan)
    val r = audit(
      1L -> (span + "a1b2c3d4e5f6g7h8i9j0" * 3),
      2L -> ("k1l2m3n4o5p6q7r8s"    + span + "t1u2v3w4x5"),
      3L -> ("y1z2o"                + span + "p1q2r3s4t5u6v7w8" * 2),
      4L -> "completely different text with no shared spans at all padding")
    assert(r(1L)._3 == 1L && r(2L)._3 == 1L && r(3L)._3 == 1L,
      s"all three span-carrying docs must be flagged: $r")
    assert(r(4L)._3 == 0L, s"unrelated doc must not be flagged: $r")
  }

  test("sub-threshold docs yield empty fingerprint sets, not errors") {
    val r = audit(
      1L -> "short",                      // < K chars: zero grams
      2L -> ("x" * (minSpan - 1)),        // K ≤ len < K+W-1: grams but no full window
      3L -> ("a1b2c3d4e5f6g7h8i9j0k1l2m3n4o5p"))  // exactly K+W-1: one window
    assert(r(1L) == ((0L, 0L, 0L)))
    assert(r(2L) == ((0L, 0L, 0L)))
    assert(r(3L)._1 == 1L, s"a ${minSpan}-char doc has exactly one window: $r")
    assert(r(3L)._3 == 0L)
  }

  test("identical docs share their whole fingerprint set") {
    val text = "the same exact document body repeated verbatim twice over 9 q"
    val r = audit(1L -> text, 2L -> text, 3L -> (text.reverse))
    assert(r(1L)._1 > 0)
    assert(r(1L)._1 == r(1L)._2, s"every fingerprint must be shared: $r")
    assert(r(1L) == r(2L))
    assert(r(3L)._2 == 0L, s"reversed doc shares no 24-gram: $r")
  }
}
