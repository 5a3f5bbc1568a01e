package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: ONE JSON line on stdout.
  *
  * Each query executes end-to-end through the `noop` DSv2 sink so the
  * full plan runs (a `count()` would let Catalyst prune projections and
  * under-measure); JVM/session startup is kept out of per-query numbers
  * by a single warmup pass of the flagship query.
  *
  * Noise discipline (this sandbox has heavy co-tenant CPU noise — the
  * same workload has measured 28 s vs 79 s run-to-run):
  *  - the clock stops BEFORE cache teardown (clearCache is bookkeeping
  *    between queries, not query cost);
  *  - sub-2 s queries report the median of 5 runs, slower ones the
  *    median of 3 — medians shrug off a single co-tenant spike where
  *    best-of-N can still be unlucky twice;
  *  - a query that fails on ANY run reports -1.0 (never a success time
  *    that silently hides a flaky failure) and is excluded from total;
  *  - per-query spread (max-min over the runs) is emitted alongside, so
  *    a noisy recording is distinguishable from a real regression.
  */
object Bench {
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

    /** (median, spread): median of 5 (including the first run) when the
      * first run is sub-2 s — inter-run noise dominates JIT there. A
      * first run ≥ 2 s is DISCARDED as warmup and the median of 3
      * fresh runs reported: heavy queries compile many query-specific
      * codegen stages the global warmup can't touch, and folding that
      * one-time cost into a median-of-3 overstates steady state 2-3×
      * (measured on dedup_clusters: 18 s first run, 5-6 s after).
      * (-1, 0) if any run fails. */
    def measure(name: String): (Double, Double) = {
      val first = time(name)
      if (first < 0) return (-1.0, 0.0)
      val times =
        if (first < 2.0) first +: Seq.fill(4)(time(name))
        else Seq.fill(3)(time(name))
      if (times.exists(_ < 0)) (-1.0, 0.0)
      else {
        val s = times.sorted
        (s(s.length / 2), s.last - s.head)
      }
    }

    time("q1_agg") // warmup: JIT + codegen + FS cache

    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> measure(n))
    val qs = results.map { case (k, (m, _)) => "\"" + k + f"\":$m%.3f" }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, (_, sp)) => "\"" + k + f"\":$sp%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread":$spreads,"sf":"$sfDir"}""")
    spark.stop()
  }
}
