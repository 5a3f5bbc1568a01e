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
  *  - a full warmup round (discarded) runs first, so JIT + per-query
  *    codegen compilation never lands in a measured sample;
  *  - the clock stops BEFORE cache teardown (clearCache is bookkeeping
  *    between queries, not query cost);
  *  - a query that fails on ANY run reports -1.0 (never a success time
  *    that silently hides a flaky failure) and is excluded from total;
  *  - stdout stays compact (%.2f medians, one aggregate `noise` figure =
  *    the worst per-query relative spread) so the driver's tail capture
  *    can never truncate it mid-JSON; the complete record — every
  *    sample, per-query spreads — goes to target/bench.json.
  */
object Bench {
  private val Rounds = 3

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
    // the driver passes no args and benches everything)
    val names = {
      val all = SparkEntry.queries.keys.toSeq.sorted
      args.headOption.filter(_.nonEmpty)
        .map(_.split(',').toSeq.filter(all.contains)).getOrElse(all)
    }

    // warmup round: JIT + per-query codegen + FS cache; not recorded
    names.foreach(time)

    // measured rounds, interleaved: samples(q) accumulates one time per
    // round, so any noise window spans many queries × one sample each
    val samples: Map[String, Seq[Double]] =
      (1 to Rounds).map(_ => names.map(n => n -> time(n)))
        .flatten.groupBy(_._1).map { case (n, ts) => n -> ts.map(_._2) }

    val stats = names.map { n =>
      val ts = samples(n)
      if (ts.exists(_ < 0)) (n, -1.0, 0.0, ts)
      else {
        val s = ts.sorted
        (n, s(s.length / 2), s.last - s.head, ts)
      }
    }
    val total = stats.map(_._2).filter(_ >= 0).sum
    // worst relative spread across queries — one number that says how
    // trustworthy this recording is (≲0.5 calm, ≥2 a noise window hit)
    val noise = stats.collect { case (_, m, sp, _) if m > 0 => sp / m }
      .foldLeft(0.0)(math.max)

    val qs = stats.map { case (k, m, _, _) => "\"" + k + f"\":$m%.2f" }
      .mkString("{", ",", "}")
    val full = {
      val perQuery = stats.map { case (k, m, sp, ts) =>
        val runs = ts.map(t => f"$t%.3f").mkString("[", ",", "]")
        "\"" + k + f"""\":{"median":$m%.3f,"spread":$sp%.3f,"runs":$runs}"""
      }.mkString("{", ",", "}")
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","rounds":$Rounds,"noise":$noise%.3f,"queries":$perQuery,"sf":"$sfDir"}"""
    }
    val out = java.nio.file.Paths.get("target", "bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, full.getBytes("UTF-8"))

    println(f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs,"noise":$noise%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
