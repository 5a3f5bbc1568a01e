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

  private def spans(docs: (Long, String)*) = {
    val out = DedupQueries.winnowingSpans(
      spark.createDataFrame(docs).toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    spark.catalog.clearCache() // release winnowingSpans' fp persist
    out
  }

  test("planted span offsets are recovered inside the planted region") {
    // one shared region, planted at char offset 6 (1-based pos 7) in
    // doc 1 and offset 20 in doc 2; disjoint alphabets elsewhere so
    // every matched fingerprint comes from inside the planted region
    val span = "WERTYUIOPASDFGHJKLZXCVBNMQWERTYUIOPASDF" // 39 chars > K+W-1
    val d1 = "a1b2c3" + span + "d4e5f6g7h8i9j0" * 3
    val d2 = "k1l2m3n4o5p6q7r8s9t0" + span + "u1v2w3x4y5"
    val r = spans(1L -> d1, 2L -> d2)
    assert(r.length == 1, s"exactly one merged span expected: ${r.mkString(",")}")
    val (da, db, s0, s1, nfp) = r.head
    assert(da == 1L && db == 2L)
    val (plantStart, plantEnd) = (7L, 6L + span.length) // 1-based char range in doc 1
    assert(s0 >= plantStart && s1 <= plantEnd,
      s"span [$s0,$s1] must sit inside the planted region [$plantStart,$plantEnd]")
    assert(s1 - s0 + 1 >= minSpan - DedupQueries.WinnowW + 1,
      s"span [$s0,$s1] too short to witness the planted region")
    assert(nfp >= 1L)
  }

  test("two well-separated planted spans yield two islands, not one hull") {
    // same pair shares TWO regions in doc 1, separated by >K unshared
    // chars — the gaps-and-islands merge must NOT bridge the gap
    val spanA = "WERTYUIOPASDFGHJKLZXCVBNMQWERTYUI" // 33 chars
    val spanB = "ZXCVBNMLKJHGFDSAPOIUYTREWQZXCVBNM" // 33 chars
    val gap = "a1b2c3d4e5f6g7h8i9j0" * 3            // 60 unshared chars
    val d1 = spanA + gap + spanB
    val d2 = "n0m9b8v7c6x5z4" + spanA + "q1w2e3r4t5y6u7i8o9p0" * 2 + spanB + "s1d2f3"
    val r = spans(1L -> d1, 2L -> d2).sortBy(_._3)
    assert(r.length == 2, s"two distinct spans expected: ${r.mkString(",")}")
    val (_, _, a0, a1, _) = r(0)
    val (_, _, b0, b1, _) = r(1)
    assert(a1 <= spanA.length, s"first island [$a0,$a1] must end inside spanA")
    assert(b0 > spanA.length + gap.length - DedupQueries.WinnowK,
      s"second island [$b0,$b1] must start at spanB")
  }

  test("overlapping matched grams merge into a single span") {
    // identical docs: every fingerprint matches, all islands chain
    // into one span covering (nearly) the whole doc
    val text = "WERTYUIOPASDFGHJKLZXCVBNMQWERTYUIOPASDFGHJKLZXCVBNM"
    val r = spans(1L -> text, 2L -> text)
    assert(r.length == 1, s"identical docs must yield one merged span: ${r.mkString(",")}")
  }
}
