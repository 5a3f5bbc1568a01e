package graft

import graft.queries.CurationQueries
import org.apache.spark.sql.functions._

/** Pins the semantic promise of `dsir_select`: the importance-weighted
  * top-K is genuinely ENRICHED in the target domain relative to the
  * corpus base rate — the property that makes importance resampling a
  * selection method rather than a random sample — plus the weight
  * table's direction on a planted two-domain corpus.
  */
class DsirSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("selection is enriched in the target domain on a mixed corpus") {
    import spark.implicits._
    // The real testdata's lang labels carry no token signal (all five
    // languages draw from ONE 31-word vocabulary), so the resampling
    // property is pinned on a planted corpus where it can hold:
    // 60 en docs lean toward vocab A, 180 others toward vocab B, with
    // shared common words keeping every bucket populated. DSIR top-100
    // must hold more en than the 25% base rate.
    val d = tmpDir("dsir_mix")
    def doc(lean: String, i: Long) =
      s"common words shared here $lean $lean $lean item$i"
    val rows =
      (0L until 60L).map(i => (i, doc("apple banana cherry", i), "en", "s", 40L)) ++
        (60L until 240L).map(i => (i, doc("xylon zephyr quartz", i), "de", "s", 40L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val sel = CurationQueries.defs.find(_.name == "dsir_select").get
      .fn(spark, d).collect().map(_.getLong(0))
    val selRate = sel.count(_ < 60L).toDouble / sel.length
    assert(sel.length == 100)
    assert(selRate > 0.25, s"selected en-share $selRate not above base rate 0.25")
  }

  test("on the real corpus: deterministic full-size selection") {
    val q = CurationQueries.defs.find(_.name == "dsir_select").get
    val a = q.fn(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = q.fn(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a.length == 100)
    assert(a == b)
    // scores arrive in selection order: non-increasing
    assert(a.map(_._2).sliding(2).forall(p => p.head >= p.last))
  }

  test("score_rank_normalize: per-source percentiles, ties share min rank") {
    val out = CurationQueries.defs.find(_.name == "score_rank_normalize").get
      .fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 500)
    out.groupBy(_._2).foreach { case (src, docs) =>
      // the source minimum sits at percentile 0
      val minChars = docs.map(_._3).min
      docs.filter(_._3 == minChars).foreach(d => assert(d._4 == 0L, s"$src min: $d"))
      // percentile is monotone in the value, ties share one rank
      val byVal = docs.groupBy(_._3).view.mapValues(_.map(_._4).distinct).toMap
      byVal.values.foreach(ps => assert(ps.size == 1, s"$src tie split: $byVal"))
      val sorted = byVal.toSeq.sortBy(_._1).map(_._2.head)
      assert(sorted == sorted.sorted, s"$src not monotone")
      // a unique source maximum sits at exactly 1e6
      val maxChars = docs.map(_._3).max
      if (docs.count(_._3 == maxChars) == 1)
        assert(byVal(maxChars).head == 1000000L)
    }
  }

  test("split_stratified_exact: per-language counts hit Hamilton targets") {
    import spark.implicits._
    val d = tmpDir("strat")
    // lang aa: 7 docs → 80/10/10 bases are 5/0/0 with two leftover
    // seats; remainders (60, 70, 70) seat val and test → 5/1/1.
    // lang bb: 10 docs → exact 8/1/1, no leftovers.
    val rows = (0L until 7L).map(i => (i, s"doc $i", "aa", "s", 10L)) ++
      (100L until 110L).map(i => (i, s"doc $i", "bb", "s", 10L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val q = queries.ProfilingQueries.defs.find(_.name == "split_stratified_exact").get
    val out = q.fn(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("aa", "train")) == 5L && out(("aa", "val")) == 1L && out(("aa", "test")) == 1L, out)
    assert(out(("bb", "train")) == 8L && out(("bb", "val")) == 1L && out(("bb", "test")) == 1L, out)
    // deterministic across runs
    assert(q.fn(spark, d).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet ==
      q.fn(spark, d).collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet)
  }

  test("token_budget_apportion: allocations are integers summing to EXACTLY B") {
    import spark.implicits._
    val d = tmpDir("apportion")
    // three languages with equal thirds — the float-proportional split
    // would give 333333.33…, the classic drift case Hamilton's method
    // exists for
    val rows = (0L until 9L).map(i =>
      (i, "one two three four five", Seq("aa", "bb", "cc")((i % 3).toInt), "s", 23L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = CurationQueries.defs.find(_.name == "token_budget_apportion").get
      .fn(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._4).sum == 1000000L, s"allocations must sum to B: ${out.toSeq}")
    assert(out.map(_._2).forall(_ == 333333L))
    assert(out.map(_._3).sum == 1L) // one remainder seat
    // deterministic seat assignment: equal remainders break by lang asc
    assert(out.find(_._3 == 1L).get._1 == "aa")
  }

  test("planted two-domain corpus: target-vocabulary docs outscore off-target") {
    import spark.implicits._
    val d = tmpDir("dsir")
    // target docs (lang=en) use vocabulary A; off-target use B; one
    // probe doc of each vocabulary carries lang=zz so only its CONTENT
    // decides its score
    val rows =
      (0L to 19L).map(i => (i, "apple banana cherry apple banana", "en", "s", 30L)) ++
        (20L to 39L).map(i => (i, "xylon zephyr quartz xylon zephyr", "de", "s", 30L)) ++
        Seq((40L, "apple banana cherry cherry", "zz", "s", 26L),
          (41L, "xylon zephyr quartz quartz", "zz", "s", 26L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val scores = CurationQueries.defs.find(_.name == "dsir_select").get
      .fn(spark, d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(40L) > scores(41L),
      s"target-vocab probe ${scores(40L)} should outscore off-target ${scores(41L)}")
  }
}
