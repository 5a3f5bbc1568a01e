package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper main: print a query's formatted physical plan and
  * its timed end-to-end cost through the noop sink. Usage:
  *   runMain graft.Explain <query>[,<query>...] [sfDir] [reps]
  * This is the ".explain and iterate" loop the build brief prescribes,
  * packaged so it needs no REPL (the sbt console chokes on pasted
  * multiline code under batch mode).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q1_agg").split(',').toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name ($sfDir) ====")
      df.explain("formatted")
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[explain] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
