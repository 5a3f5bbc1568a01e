package graft

import graft.queries.DedupQueries

/** Guarantees of the exact duplicated-substring span operator
  * (DedupQueries.substringSpans) — cross-engine value equality is the
  * DuckDB oracle gate's job; these pin the algorithmic promises: a
  * verbatim cross-doc region of ≥ K chars is recovered as ONE span at
  * its exact char offsets in EVERY doc carrying it (no winnowing-style
  * sampling gap), within-doc repetition alone never flags, and
  * sub-K docs degrade to empty gram sets rather than inverted
  * `sequence` ranges. */
class SubstringDedupSpec extends SparkSuite {

  private def K = DedupQueries.SubstrK // 24

  /** (doc_id, span_start, span_end, n_grams) rows keyed by doc. */
  private def spans(docs: (Long, String)*): Map[Long, Seq[(Long, Long, Long)]] = {
    val out = DedupQueries.substringSpans(
      spark.createDataFrame(docs).toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sortBy(_._1).toSeq }
    spark.catalog.clearCache() // release substringSpans's gram persist
    out
  }

  test("a shared 40-char region is one exact span at each doc's offset") {
    // disjoint alphabets around the planted region so no accidental
    // 24-gram collisions; offsets differ per doc (alignment-free).
    val shared = "THEQUICKBROWNFOXJUMPSOVERTHELAZYDOGAGAIN" // 40 chars
    assert(shared.length == 40)
    val preA = "a1b2c3d4e5"          // span at chars 11..50 of doc A
    val preB = "z9y8x7w6v5u4t3s2r1q0" // span at chars 21..60 of doc B
    val r = spans(
      1L -> (preA + shared + "f6g7h8i9j0" * 2),
      2L -> (preB + shared + "p1o2n3m4l5k6"),
      3L -> "completely unrelated filler text with nothing shared at all ok")
    // grams of the shared region: starts preLen+1 .. preLen+40-K+1,
    // span covers [preLen+1, preLen+40], n_grams = 40-K+1 = 17
    assert(r(1L) == Seq((preA.length + 1L, preA.length + 40L, 40L - K + 1)),
      s"doc 1 span: ${r.get(1L)}")
    assert(r(2L) == Seq((preB.length + 1L, preB.length + 40L, 40L - K + 1)),
      s"doc 2 span: ${r.get(2L)}")
    assert(!r.contains(3L), s"unrelated doc must have no spans: $r")
  }

  test("two disjoint shared regions in one doc stay two islands") {
    val s1 = "FIRSTSHAREDREGIONOFTEXTXX"  // 25 chars ≥ K
    val s2 = "SECONDSHAREDREGIONHEREYY" // 24 chars = K
    // gap of K+ chars between the regions so the islands cannot chain
    val r = spans(
      1L -> (s1 + ("g1h2i3j4k5l6m7" * 2) + s2),
      2L -> ("q9r8s7t6u5" + s1 + "v4w3x2y1z0" * 3),
      3L -> ("n0o9p8" + s2 + "d5e4f3c2b1a0" * 2))
    assert(r(1L).size == 2, s"doc 1 must carry two separate spans: $r")
    val Seq((a0, a1, _), (b0, b1, _)) = r(1L)
    assert((a0, a1) == (1L, s1.length.toLong), s"first span wrong: $r")
    val s2Start = s1.length + 28 + 1L
    assert((b0, b1) == (s2Start, s2Start + s2.length - 1), s"second span wrong: $r")
  }

  test("within-doc repetition alone does not flag (df is cross-doc)") {
    val rep = "INTERNALLYREPEATEDBLOCKZZ" // 25 chars, repeated inside doc 1 only
    val r = spans(
      1L -> (rep + "a1b2c3d4e5" + rep),
      2L -> "some other unrelated document body with plenty of characters")
    assert(r.isEmpty, s"intra-doc repeats must not produce spans: $r")
  }

  test("sub-K docs yield no grams, not inverted ranges") {
    val r = spans(
      1L -> "short",
      2L -> ("x" * (K - 1)),
      3L -> ("x" * (K - 1)))
    assert(r.isEmpty, s"sub-K docs can share nothing certifiable: $r")
  }

  private def cleaned(docs: (Long, String)*): Map[Long, (Long, Long, Long, Long)] = {
    val out = DedupQueries.substringCleaned(
      spark.createDataFrame(docs.map { case (id, t) => (id, t, t.length.toLong) })
        .toDF("doc_id", "text", "n_chars"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    spark.catalog.clearCache()
    out
  }

  test("cleaning keeps the first copy whole and cuts exactly the shared span from later docs") {
    // prefixes end in DIFFERENT chars ('5' vs '4') — a common last
    // prefix char genuinely extends the duplicated region one char
    // left, which is correct behavior but not this test's target
    val shared = "THEQUICKBROWNFOXJUMPSOVERTHELAZYDOGAGAIN" // 40 chars
    val preB = "z9y8x7w6v4"
    val sufB = "u4t3s2r1q0k1l2"
    val docA = "a1b2c3d4e5" + shared + "f6g7h8i9j0"
    val docB = preB + shared + sufB
    val docC = "entirely unrelated text with no shared grams whatsoever here"
    val r = cleaned(1L -> docA, 2L -> docB, 3L -> docC)
    assert(r(1L) == ((docA.length.toLong, 0L, docA.length.toLong, 0L)),
      s"lowest doc_id must keep everything: $r")
    assert(r(2L) == ((docB.length.toLong, 40L, docB.length.toLong - 40L, 1L)),
      s"later doc must lose exactly the 40 shared chars as one span: $r")
    assert(r(3L) == ((docC.length.toLong, 0L, docC.length.toLong, 0L)),
      s"unique doc untouched: $r")
  }

  test("cleaning a doc-id-reversed corpus flips who survives") {
    val shared = "WHOLLYSHAREDREGIONBETWEENBOTHDOCS012345"
    val r = cleaned(
      5L -> ("m1n2o3p4q5" + shared),
      2L -> (shared + "r6s7t8u9v0"))
    assert(r(2L)._2 == 0L, s"doc 2 is now the first copy: $r")
    assert(r(5L)._2 == shared.length.toLong, s"doc 5 loses the region: $r")
  }

  test("identical docs are covered end to end by one span") {
    val text = "the very same document body verbatim in both copies 1 2 3 ok"
    val r = spans(1L -> text, 2L -> text)
    val want = Seq((1L, text.length.toLong, text.length.toLong - K + 1))
    assert(r(1L) == want && r(2L) == want, s"full-cover span expected: $r")
  }
}
