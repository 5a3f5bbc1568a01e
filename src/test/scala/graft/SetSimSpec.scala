package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Pins the exact prefix-filtered set-similarity join: zero false
  * negatives against the quadratic all-pairs ground truth (the whole
  * point of the "exact" claim), genuine candidate pruning (the whole
  * point of the prefix), and the prefix-length arithmetic on a planted
  * boundary pair.
  */
class SetSimSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prefix-filtered join EQUALS brute-force all-pairs at tau=0.8") {
    val fast = pairSet(DedupQueries.defs.find(_.name == "dedup_setsim_prefix").get
      .fn(spark, dir))
    spark.catalog.clearCache()
    val truth = pairSet(DedupQueries.allPairsJaccard(spark, dir))
    spark.catalog.clearCache()
    assert(truth.nonEmpty) // testdata plants near-dups
    assert(fast == truth, s"missing=${truth -- fast} extra=${fast -- truth}")
  }

  test("prefix candidates genuinely prune vs every shared-shingle pair") {
    val sh = DedupQueries.shingleSet(spark, dir).persist()
    sh.count()
    val nPrefix = DedupQueries.prefixCandidates(sh, DedupQueries.SetSimTau).count()
    val nShared = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    sh.unpersist()
    assert(nPrefix < nShared, s"prefix=$nPrefix shared=$nShared")
    assert(nPrefix > 0)
  }

  test("dedup_edit_distance: one-char OCR noise flags, real dups score high") {
    import spark.implicits._
    val d = tmpDir("editdist")
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    val rows = Seq(
      (0L, base, "en", "s", base.length.toLong),
      // one-character in-word edit (OCR-style): shingles break at 3
      // windows but the char distance is 1 → edit-level dup
      (1L, base.replaceFirst("quick", "quzck"), "en", "s", base.length.toLong),
      // unrelated filler so the corpus isn't a single LSH bucket
      (2L, "completely different content about databases and queries", "en", "s", 56L),
      (3L, "yet another unrelated document with its own words", "en", "s", 49L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = DedupQueries.defs.find(_.name == "dedup_edit_distance").get
      .fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(4))).toMap
    spark.catalog.clearCache()
    assert(out.contains((0L, 1L)), s"noisy twin not an LSH candidate: $out")
    val (lev, isDup) = out((0L, 1L))
    assert(lev == 1L && isDup == 1L, s"lev=$lev isDup=$isDup")
  }

  test("boundary pair: J exactly at tau is found, just below is not") {
    import spark.implicits._
    // sets over elements e1..e10 as one-token "shingles": A = e1..e9,
    // B = e1..e9 ∪ {e10} → J = 9/10 ≥ 0.8; C shares 6 of its 9 with A
    // → J = 6/12 = 0.5 < 0.8
    val rows =
      (1 to 9).map(i => (1L, s"e$i")) ++
        (1 to 10).map(i => (2L, s"e$i")) ++
        ((1 to 6).map(i => (3L, s"e$i")) ++ (11 to 13).map(i => (3L, s"e$i")))
    val sh = rows.toDF("doc_id", "s")
    val found = DedupQueries.prefixCandidates(sh, DedupQueries.SetSimTau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // completeness: the qualifying pair MUST be a candidate
    assert(found.contains((1L, 2L)))
    // verification kills the sub-threshold pair even if it was a candidate
    val verified = DedupQueries.jaccardPairs(sh,
        Some(DedupQueries.prefixCandidates(sh, DedupQueries.SetSimTau)))
      .filter(col("jaccard") >= DedupQueries.SetSimTau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified == Set((1L, 2L)))
  }
}
