package graft

import org.apache.spark.sql.SparkSession

/** Throwaway timing harness for the dedup hot path (Test scope only,
  * run by hand: `sbt "Test/runMain graft.ProfMinhash"`). */
object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (q <- Seq("dedup_clusters"); i <- 1 to 4) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[prof] $q run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
