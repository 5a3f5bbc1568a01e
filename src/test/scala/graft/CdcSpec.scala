package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Pins the claim that justifies content-defined chunking over
  * fixed-size blocking: chunk boundaries derive from CONTENT, so an
  * edit near the front of a document leaves every chunk after the next
  * anchor byte-identical, while fixed-size blocks all mis-align after
  * one insertion.
  */
class CdcSpec extends SparkSuite {

  // real anchor/non-anchor words discovered through the same hash the
  // operator uses — the test constructs documents with KNOWN boundaries
  private lazy val words = (0 until 2000).map(i => s"w$i")
  private lazy val anchors = words.filter(DedupQueries.cdcIsAnchor).take(8)
  private lazy val plain = words.filterNot(DedupQueries.cdcIsAnchor).take(40)

  test("the corpus yields both anchor and plain probe words") {
    // mask 4 → ~1/4 of words anchor; both pools must be deep enough
    assert(anchors.size == 8 && plain.size == 40)
  }

  test("an early insertion leaves every post-anchor chunk identical; fixed blocks all shift") {
    import spark.implicits._
    // doc A: p0 p1 | A0 p2 p3 p4 | A1 p5 p6 | A2 p7 p8 p9
    val a = Seq(plain(0), plain(1),
      anchors(0), plain(2), plain(3), plain(4),
      anchors(1), plain(5), plain(6),
      anchors(2), plain(7), plain(8), plain(9))
    // doc B: one plain token inserted at position 1 — before any anchor
    val b = a.take(1) ++ Seq(plain(30)) ++ a.drop(1)
    val docs = Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = DedupQueries.cdcChunks(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("chunk")))
    val ca = chunks.filter(_._1 == 1L).map(_._2).toSet
    val cb = chunks.filter(_._1 == 2L).map(_._2).toSet
    // every chunk STARTING AT an anchor is untouched by the insertion —
    // 3 shared chunks; only the pre-anchor prefix chunk differs
    val expectedShared = Set(
      s"${anchors(0)} ${plain(2)} ${plain(3)} ${plain(4)}",
      s"${anchors(1)} ${plain(5)} ${plain(6)}",
      s"${anchors(2)} ${plain(7)} ${plain(8)} ${plain(9)}")
    assert(ca.intersect(cb) == expectedShared, s"a=$ca b=$cb")
    assert(ca.size == 4 && cb.size == 4)
    // the CONTRAST: fixed-size 4-token blocks share NOTHING after the
    // same insertion (every block boundary shifted by one)
    def blocks(ts: Seq[String]) = ts.grouped(4).map(_.mkString(" ")).toSet
    assert(blocks(a).intersect(blocks(b)).isEmpty,
      "fixed blocking unexpectedly survived the insertion")
  }

  test("anchor tokens start their chunk; chunk_seq 0 holds the pre-anchor prefix") {
    import spark.implicits._
    val t = Seq(plain(10), anchors(3), plain(11), anchors(4))
    val docs = Seq((7L, t.mkString(" "))).toDF("doc_id", "text")
    val rows = DedupQueries.cdcChunks(docs).collect()
      .map(r => r.getAs[Long]("chunk_seq") -> r.getAs[String]("chunk")).toMap
    assert(rows == Map(
      0L -> plain(10),
      1L -> s"${anchors(3)} ${plain(11)}",
      2L -> anchors(4)))
  }
}
