package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway timing harness for the dedup hot path (Test scope only,
  * run by hand: `sbt "Test/runMain graft.queries.ProfMinhash"`).
  * Times the shared stages individually (warm cache discipline matches
  * the queries: persist + clearCache per round), then the full
  * clusters query — the gap between stage sum and full-query time is
  * the superstep loop + per-plan codegen cost. */
object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 2) { // round 1 pays JIT/codegen warmup
      println(s"=== round $round ===")
      spark.catalog.clearCache()
      val sh = t("sh persist+count") {
        val x = DedupQueries.shingleSet(spark, dir, Some(0.001)).persist()
        x.count(); x
      }
      t("cand count") {
        DedupQueries.lshCandidates(sh).count()
      }
      t("pairs count") {
        DedupQueries.jaccardPairs(sh, Some(DedupQueries.lshCandidates(sh)))
          .filter(col("jaccard") >= 0.8).count()
      }
      spark.catalog.clearCache()
      t("full dedup_clusters") {
        graft.SparkEntry.queries("dedup_clusters")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
