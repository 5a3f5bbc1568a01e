package graft.queries
import org.apache.spark.sql.SparkSession
object ProfCanon {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (i <- 1 to 2) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("dedup_canonical")(spark, dir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[prof] run$i fn-call ${(t1 - t0) / 1e9}%.2f s, write ${(t2 - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
