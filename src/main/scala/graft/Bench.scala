package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: ONE JSON line on stdout.
  *
  * Each query executes end-to-end through the `noop` DSv2 sink so the
  * full plan runs (a `count()` would let Catalyst prune projections and
  * under-measure); JVM/session startup is kept out of per-query numbers
  * by a single warmup pass of the flagship query.
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

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      } finally {
        // some queries persist intermediates (documented in
        // DedupQueries); drop them so no query's cache skews the next
        spark.catalog.clearCache()
      }
      (System.nanoTime() - t0) / 1e9
    }

    run("q1_agg") // warmup: JIT + codegen + FS cache

    // best-of-2: steady-state throughput, robust to co-tenant CPU noise
    val results = SparkEntry.queries.keys.toSeq.sorted.map { n =>
      val a = run(n)
      val b = run(n)
      n -> (if (a < 0 || b < 0) math.max(a, b) else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
