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

  test("dedup_containment finds a planted subset-dup invisible to Jaccard") {
    import spark.implicits._
    val d = tmpDir("containment")
    val wordsA = (0 until 30).map(i => s"alpha$i").mkString(" ")
    val filler = (0 until 90).map(i => s"beta$i").mkString(" ")
    val rows = Seq(
      (0L, wordsA, "en", "s", wordsA.length.toLong),
      // doc 0 verbatim at the head of doc 1: containment(0 in 1) = 1.0,
      // Jaccard ≈ 28/118 ≈ 0.24 — far under every minhash contract
      (1L, wordsA + " " + filler, "en", "s",
        (wordsA.length + filler.length + 1).toLong),
      (2L, "unrelated words entirely different topic matter here", "en", "s", 52L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = DedupQueries.defs.find(_.name == "dedup_containment").get
      .fn(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    spark.catalog.clearCache()
    assert(got.keySet == Set((0L, 1L)), got.toString)
    assert(got((0L, 1L)) == 1.0)
    val jac = DedupQueries.defs.find(_.name == "dedup_ngram_jaccard").get
      .fn(spark, d).collect()
    spark.catalog.clearCache()
    assert(jac.isEmpty, s"J=0.24 pair must not pass the 0.8 contract: ${jac.toSeq}")
  }

  test("containment prefix filtering is lossless vs all shared-shingle pairs") {
    val sh = DedupQueries.shingleSet(spark, dir).persist()
    sh.count()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val c = round(col("inter").cast("double") /
      least(col("sa.n"), col("sb.n")).cast("double"), 6)
    val brute = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), c.as("containment"))
      .filter(col("containment") >= DedupQueries.ContainTau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    sh.unpersist()
    val fast = DedupQueries.defs.find(_.name == "dedup_containment").get
      .fn(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("containment"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.catalog.clearCache()
    assert(brute.nonEmpty)
    assert(fast == brute, s"missing=${brute -- fast} extra=${fast -- brute}")
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
