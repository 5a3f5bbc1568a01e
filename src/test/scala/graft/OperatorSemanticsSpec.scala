package graft

import org.apache.spark.sql.functions._

/** Property pins for the round-3 pipeline operators — cross-engine
  * value equality is the DuckDB oracle gate's job; these assert the
  * semantic invariants the operators promise, on real testdata. */
class OperatorSemanticsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("pack_sequences: packs partition the corpus and fill to the budget") {
    val budget = 256L
    val packs = SparkEntry.queries("pack_sequences")(spark, dir).collect()
      .map(r => ((r.getAs[String]("lang"), r.getAs[Long]("shard")),
        r.getAs[Long]("pack_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("pack_tokens")))

    // partition: per-lang doc/token totals match the corpus exactly
    // (shards partition each lang, so summing over a lang's shards
    // must lose or double-count nothing)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n"))
      .groupBy("lang").agg(count(lit(1)).as("nd"), sum("n").as("nt"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byLang = packs.groupBy(_._1._1)
    assert(byLang.keySet == docs.keySet)
    for ((lang, ps) <- byLang) {
      assert(ps.map(_._3).sum == docs(lang)._1, s"$lang doc count")
      assert(ps.map(_._4).sum == docs(lang)._2, s"$lang token total")
    }
    // testdata is far below the sizing threshold → the shard contract
    // pins N=16 (what the oracle assumes)
    assert(packs.map(_._1._2).forall(s => s >= 0 && s < 16))
    // fill & contiguity hold WITHIN each (lang, shard) packing unit:
    // when pack k+1 exists, the running token total through pack k has
    // crossed (k+1)·budget — i.e. no pack opens early
    for ((unit, ps) <- packs.groupBy(_._1)) {
      val ordered = ps.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == ordered.indices.map(_.toLong),
        s"$unit pack_ids not contiguous: ${ordered.map(_._2).mkString(",")}")
      val cums = ordered.map(_._4).scanLeft(0L)(_ + _).drop(1)
      for (k <- 0 until ordered.length - 1)
        assert(cums(k) >= budget * (k + 1),
          s"$unit pack $k closed at ${cums(k)} tokens < ${budget * (k + 1)}")
    }
  }

  test("asof_attribution: attributed click precedes its purchase; purchases preserved") {
    val res = SparkEntry.queries("asof_attribution")(spark, dir).collect()
    val nPurchases = graft.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(res.length == nPurchases) // left-join semantics: none dropped
    for (r <- res if !r.isNullAt(r.fieldIndex("click_us"))) {
      val (pUs, pId) = (r.getAs[Long]("purchase_us"), r.getAs[Long]("event_id"))
      val (cUs, cId) = (r.getAs[Long]("click_us"), r.getAs[Long]("click_event_id"))
      assert(cUs < pUs || (cUs == pUs && cId < pId),
        s"click ($cUs,$cId) not before purchase ($pUs,$pId)")
    }
    // the corpus plants clicks before purchases, so attribution is
    // non-trivial here
    assert(res.exists(!_.isNullAt(res.head.fieldIndex("click_us"))))
  }

  test("dedup_clusters on a corpus with no near-dups returns empty, not an error") {
    import spark.implicits._
    val out = s"${tmpDir("clean_corpus")}/documents.parquet"
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "t", 36L),
      (2L, "one two three four five six seven", "en", "t", 33L),
      (3L, "red orange yellow green blue violet", "en", "t", 35L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(out)
    val res = SparkEntry.queries("dedup_clusters")(
      spark, out.stripSuffix("/documents.parquet"))
    assert(res.count() == 0) // regression: SUM over empty labels NPE'd
    spark.catalog.clearCache()
    // the stats histogram degrades to one all-singletons row
    val st = SparkEntry.queries("dedup_cluster_stats")(
      spark, out.stripSuffix("/documents.parquet")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(st.toSeq == Seq((1L, 3L, 3L, 0L)), st.mkString(","))
  }

  test("dedup_cluster_stats partitions the corpus and matches the label frame") {
    val dir = "/root/testdata/sf0.001"
    val st = SparkEntry.queries("dedup_cluster_stats")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    spark.catalog.clearCache()
    val labels = SparkEntry.queries("dedup_clusters")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    // Σ n_docs over the histogram = |documents| (singletons restored)
    assert(st.map(_._3).sum == nDocs, st.mkString(","))
    // the histogram is exactly the label frame's size distribution
    val expected = labels.groupBy(_._2).values.map(_.length.toLong).toSeq
      .groupBy(identity).map { case (sz, xs) => sz -> xs.length.toLong }
    st.filter(_._1 > 1L).foreach { case (sz, n, nd, ex) =>
      assert(expected.get(sz).contains(n), s"size $sz: $n vs ${expected.get(sz)}")
      assert(nd == sz * n && ex == (sz - 1) * n)
    }
    assert(st.filter(_._1 > 1L).map(_._1 * 1000 + 0).toSet ==
      expected.keys.map(_ * 1000 + 0).toSet)
    // excess_docs = labeled docs − #clusters (what canonical selection removes)
    val nClusters = labels.map(_._2).distinct.length.toLong
    assert(st.map(_._4).sum == labels.length - nClusters)
    // non-vacuous: real dup clusters exist at this SF
    assert(st.exists(_._1 > 1L))
  }

  test("graft_dot and the interpreted dot agree on mismatched-length arrays: NULL") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f), Array(4f, 5f, 6f)))
      .toDF("a", "short", "b")
    val r = df.select(
      graft.functions.TextFunctions.dotFast(col("a"), col("short")).as("fast_mismatch"),
      graft.functions.TextFunctions.dot(col("a"), col("short")).as("slow_mismatch"),
      graft.functions.TextFunctions.dotFast(col("a"), col("b")).as("fast_ok")).head
    // a malformed embedding must NULL out of both paths identically,
    // never produce a silently truncated dot product
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getDouble(2) == (4.0 + 10.0 + 18.0))
  }

  test("text_redact: tags replace every synthetic injection") {
    val res = SparkEntry.queries("text_redact")(spark, dir)
    // every doc got exactly one injected email and one injected ref id
    val counts = res.select("n_emails", "n_nums").distinct().collect()
    assert(counts.length == 1 && counts(0).getLong(0) == 1L && counts(0).getLong(1) == 1L)
  }

  test("embedding_health: planted NaN/Inf/zero/ragged vectors are counted, healthy ones are not") {
    import spark.implicits._
    val d = tmpDir("emb_health")
    val rows = Seq(
      (1L, Seq(0.1f, 0.2f, 0.3f, 0.4f), 0),                     // healthy
      (2L, Seq(0.1f, Float.NaN, 0.3f, 0.4f), 0),                // NaN
      (3L, Seq(0.1f, 0.2f, Float.PositiveInfinity, 0.4f), 0),   // +Inf
      (4L, Seq(0.0f, 0.0f, 0.0f, 0.0f), 1),                     // zero-norm
      (5L, Seq(0.1f, 0.2f, 0.3f), 1),                           // ragged (modal = 4)
      (6L, Seq(0.5f, -0.5f, 0.25f, -0.25f), 1),                 // healthy
      (7L, Seq(Float.NegativeInfinity, 0.2f, 0.3f, 0.4f), 1))   // -Inf
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val got = SparkEntry.queries("embedding_health")(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    //            (n_vecs, n_nan, n_inf, n_zero, n_ragged)
    assert(got(0L) == ((3L, 1L, 1L, 0L, 0L)), got.toString)
    assert(got(1L) == ((4L, 0L, 1L, 1L, 1L)), got.toString)
    // a NaN vector is never double-counted as zero-norm
    // and testdata itself is clean
    val clean = SparkEntry.queries("embedding_health")(spark, dir).collect()
    assert(clean.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L &&
      r.getLong(4) == 0L && r.getLong(5) == 0L))
  }

  test("agg_incremental_merge: merge algebra handles base-only, delta-only, and overlapping groups") {
    import spark.implicits._
    val d = tmpDir("incr_merge")
    val ts = (h: Int) => java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:15:00")
    // event_id % 10 < 9 routes to BASE, == 9 to DELTA:
    //  hour 01 / view: base-only (ids 1, 2)
    //  hour 02 / view: delta-only (ids 19, 29)  <- the key the base has
    //                                              never seen
    //  hour 03 / click: overlap (base 3, 4; delta 39), max lives in delta
    val rows = Seq(
      (1L, ts(1), 10L, "view", 1.25, "{}"), (2L, ts(1), 11L, "view", 2.00, "{}"),
      (19L, ts(2), 12L, "view", 5.50, "{}"), (29L, ts(2), 13L, "view", 0.75, "{}"),
      (3L, ts(3), 14L, "click", 3.00, "{}"), (4L, ts(3), 15L, "click", 1.00, "{}"),
      (39L, ts(3), 16L, "click", 9.25, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("agg_incremental_merge")(spark, d).collect()
      .map(r => ((r.getAs[String]("event_type"), r.getAs[String]("hour")),
        (r.getAs[Long]("n_events"), r.getAs[Long]("sum_value_cents"),
          r.getAs[Long]("max_value_cents")))).toMap
    assert(got.size == 3)
    assert(got(("view", "2024-03-01 01:00:00")) == ((2L, 325L, 200L)))
    assert(got(("view", "2024-03-01 02:00:00")) == ((2L, 625L, 550L)))
    assert(got(("click", "2024-03-01 03:00:00")) == ((3L, 1325L, 925L)))
    // and on real data the merged table equals the single-pass aggregate
    val merged = SparkEntry.queries("agg_incremental_merge")(spark, dir)
      .collect().map(_.toSeq).toSet
    val direct = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.queries.QueryDef.cents(col("value"))).as("sum_value_cents"),
        max(graft.queries.QueryDef.cents(col("value"))).as("max_value_cents"))
      .collect().map(_.toSeq).toSet
    assert(merged == direct)
  }
}
