package graft

import graft.queries.CurationQueries
import org.apache.spark.sql.functions._

/** Semantics of the C4-style corpus boilerplate-line removal
  * (CurationQueries.boilerplateClean) on constructed corpora where the
  * right answer is computable by hand — the DuckDB oracle gate pins
  * cross-engine equality on real data; these pin the rule itself:
  * DISTINCT-doc counting (not occurrence counting), blank-line
  * passthrough, threshold boundary, and order-preserving
  * reconstruction including the all-lines-removed document. */
class BoilerplateSpec extends SparkSuite {

  private def linesDf(rows: Seq[(Long, Int, String)]) =
    spark.createDataFrame(rows).toDF("doc_id", "pos", "line")

  private def kept(rows: Seq[(Long, Int, String)], minDocs: Int): Set[(Long, Int, String)] =
    CurationQueries.boilerplateClean(linesDf(rows), minDocs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  test("line in >= minDocs distinct docs is removed everywhere; below threshold survives") {
    val rows = Seq(
      (1L, 0, "cookie banner"), (1L, 1, "real text one"),
      (2L, 0, "cookie banner"), (2L, 1, "real text two"),
      (3L, 0, "cookie banner"), (3L, 1, "seen twice"),
      (4L, 0, "seen twice"), (4L, 1, "real text four"))
    val k = kept(rows, 3)
    // "cookie banner" in 3 distinct docs -> gone; "seen twice" in 2 -> stays
    assert(!k.exists(_._3 == "cookie banner"), s"got $k")
    assert(k.count(_._3 == "seen twice") == 2, s"got $k")
    assert(k.size == 5, s"got $k")
  }

  test("distinct-doc counting: 3 occurrences inside ONE doc do not trip the rule") {
    val rows = Seq(
      (1L, 0, "chorus"), (1L, 1, "chorus"), (1L, 2, "chorus"),
      (2L, 0, "chorus"), (2L, 1, "other"))
    // "chorus" occurs 4 times but in only 2 distinct docs -> kept at minDocs=3
    assert(kept(rows, 3).count(_._3 == "chorus") == 4)
    // at minDocs=2 it crosses the distinct-doc threshold -> removed
    assert(kept(rows, 2).count(_._3 == "chorus") == 0)
  }

  test("blank lines are never boilerplate, even when every doc has one") {
    val rows = Seq(
      (1L, 0, "a"), (1L, 1, ""), (2L, 0, "b"), (2L, 1, ""),
      (3L, 0, "c"), (3L, 1, "  "))
    val k = kept(rows, 2)
    assert(k.count(_._3.trim.isEmpty) == 3, s"blanks must pass through: $k")
  }

  test("reconstruction keeps original order and yields empty text for a fully-boilerplate doc") {
    val docs = spark.createDataFrame(Seq(
      (1L, "nav\nalpha\nnav\nbeta"),
      (2L, "nav\ngamma"),
      (3L, "nav"))).toDF("doc_id", "text")
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n", -1)).as(Seq("pos", "line")))
    val rebuilt = CurationQueries.boilerplateClean(lines, 3)
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as("cleaned"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rebuilt(1L) == "alpha\nbeta", s"got $rebuilt")
    assert(rebuilt(2L) == "gamma", s"got $rebuilt")
    // doc 3 vanishes from the grouped frame; the QueryDef's left join
    // reports it as kept_lines=0 with md5('') — here it must be absent
    assert(!rebuilt.contains(3L), s"got $rebuilt")
  }
}
