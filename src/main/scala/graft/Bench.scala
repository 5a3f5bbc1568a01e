package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: ONE JSON line on stdout.
  *
  * Each query executes end-to-end through the `noop` DSv2 sink so the
  * full plan runs (a `count()` would let Catalyst prune projections and
  * under-measure).
  *
  * Noise discipline (this sandbox has heavy co-tenant CPU noise — the
  * same workload has measured 28 s vs 79 s run-to-run):
  *  - repeats are INTERLEAVED round-robin: round 1 of every query, then
  *    round 2 of every query, then round 3. Back-to-back repeats of one
  *    query let a single multi-minute co-tenant spike poison every
  *    sample of a contiguous block (exactly what BENCH_r02 recorded);
  *    interleaving spreads a noise window across one sample of many
  *    queries, and the per-query median across rounds shrugs it off;
  *  - ADAPTIVE rounds: after the standard 3 measured rounds, if the
  *    RAW noise figure (max relative untrimmed range — deliberately
  *    burst-sensitive) still exceeds 2, up to 4 MORE interleaved
  *    rounds run — the published medians are across all rounds, so the
  *    record survives a noise window instead of merely flagging it;
  *  - the PUBLISHED per-query spread (and the aggregate `noise` built
  *    from it) is MAD-based — 2 × median absolute deviation from the
  *    median — so it describes STEADY-STATE variance: a co-tenant
  *    burst landing in up to half the rounds cannot masquerade as
  *    query variance (BENCH_r05 recorded bm25_search bursting in 2 of
  *    7 rounds; a trimmed range drops only one outlier, MAD shrugs off
  *    any <50% contamination). The burst-sensitive raw figure is still
  *    published as `raw_noise`, and every raw sample still lands in
  *    target/bench.json, untrimmed — the record keeps the evidence,
  *    the headline keeps the signal;
  *  - a full warmup round (discarded) runs first, so JIT + per-query
  *    codegen compilation never lands in a measured sample;
  *  - the clock stops BEFORE cache teardown (clearCache is bookkeeping
  *    between queries, not query cost);
  *  - a query that fails on ANY run reports -1.0 (never a success time
  *    that silently hides a flaky failure) and is excluded from total;
  *  - stdout stays compact (%.2f medians, one aggregate `noise` figure)
  *    so the driver's tail capture can never truncate it mid-JSON; the
  *    complete record — every sample, per-query spreads — goes to
  *    target/bench.json.
  */
object Bench {
  private val BaseRounds = 3
  private val MaxRounds = 7
  private val NoiseTarget = 2.0

  /** Median / MAD-based spread of one query's samples. Spread is
    * 2 × median(|t − median|): robust to bursts contaminating up to
    * half the samples (a trimmed range only survives one), so the
    * published figure reflects steady state. The burst-SENSITIVE
    * range lives in [[rawSpread]] and drives the adaptive extension. */
  private[graft] def stat(ts: Seq[Double]): (Double, Double) = {
    val s = ts.sorted
    val median = s(s.length / 2)
    val devs = s.map(t => math.abs(t - median)).sorted
    (median, 2.0 * devs(devs.length / 2))
  }

  /** Untrimmed range — the burst-sensitive figure: any single co-tenant
    * spike shows up here, which is exactly what the adaptive-extension
    * trigger wants (more rounds → the MAD/median stats get more clean
    * samples to describe steady state with). */
  private[graft] def rawSpread(ts: Seq[Double]): Double =
    if (ts.isEmpty) 0.0 else ts.max - ts.min

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** One timed execution; elapsed computed before cache teardown. */
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      } finally {
        // some queries persist intermediates (documented in
        // DedupQueries); drop them so no query's cache skews the next
        spark.catalog.clearCache()
      }
    }

    // optional arg: comma-separated query subset (local iteration aid;
    // the driver passes no args and benches everything). Unknown names
    // FAIL fast — a typo'd subset silently benching fewer (or zero)
    // queries looks like success with no diagnostic.
    val names = {
      val all = SparkEntry.queries.keys.toSeq.sorted
      args.headOption.filter(_.nonEmpty) match {
        case None => all
        case Some(arg) =>
          val requested = arg.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
          val unknown = requested.filterNot(all.contains)
          if (unknown.nonEmpty) {
            System.err.println(
              s"[bench] unknown queries: ${unknown.mkString(", ")} — known: ${all.mkString(", ")}")
            spark.stop()
            sys.exit(2)
          }
          requested
      }
    }

    // warmup round: JIT + per-query codegen + FS cache; not recorded
    names.foreach(time)

    // measured rounds, interleaved: samples(q) accumulates one time per
    // round, so any noise window spans many queries × one sample each.
    // Extra rounds run while the aggregate noise figure says the
    // recording is untrustworthy (co-tenant window), capped at 7.
    val samples = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      names.map(n => n -> Vector.empty[Double]): _*)
    def worstRawNoise: Double = samples.values.collect {
      case ts if ts.nonEmpty && ts.forall(_ >= 0) =>
        val m = stat(ts)._1
        if (m > 0) rawSpread(ts) / m else 0.0
    }.foldLeft(0.0)(math.max)

    var rounds = 0
    while (rounds < BaseRounds || (worstRawNoise > NoiseTarget && rounds < MaxRounds)) {
      names.foreach(n => samples(n) = samples(n) :+ time(n))
      rounds += 1
      if (rounds >= BaseRounds && worstRawNoise > NoiseTarget && rounds < MaxRounds)
        System.err.println(
          f"[bench] raw noise ${worstRawNoise}%.2f > $NoiseTarget%.1f after $rounds rounds — extending")
    }

    val stats = names.map { n =>
      val ts = samples(n)
      if (ts.exists(_ < 0)) (n, -1.0, 0.0, ts)
      else {
        val (m, sp) = stat(ts)
        (n, m, sp, ts)
      }
    }
    val total = stats.map(_._2).filter(_ >= 0).sum
    // worst relative MAD spread across queries — steady-state
    // trustworthiness (≲0.5 calm even if a burst round was recorded);
    // rawNoise is the burst-sensitive companion (what extension saw)
    val noise = stats.collect { case (_, m, sp, _) if m > 0 => sp / m }
      .foldLeft(0.0)(math.max)
    val rawNoise = stats.collect { case (_, m, _, ts) if m > 0 => rawSpread(ts) / m }
      .foldLeft(0.0)(math.max)

    val qs = stats.map { case (k, m, _, _) => "\"" + k + f"\":$m%.2f" }
      .mkString("{", ",", "}")
    val full = {
      val perQuery = stats.map { case (k, m, sp, ts) =>
        val runs = ts.map(t => f"$t%.3f").mkString("[", ",", "]")
        "\"" + k + f"""\":{"median":$m%.3f,"spread":$sp%.3f,"raw_spread":${rawSpread(ts)}%.3f,"runs":$runs}"""
      }.mkString("{", ",", "}")
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","rounds":$rounds,"noise":$noise%.3f,"raw_noise":$rawNoise%.3f,"queries":$perQuery,"sf":"$sfDir"}"""
    }
    val out = java.nio.file.Paths.get("target", "bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, full.getBytes("UTF-8"))

    println(f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs,"noise":$noise%.2f,"raw_noise":$rawNoise%.2f,"rounds":$rounds,"sf":"$sfDir"}""")
    spark.stop()
  }
}
