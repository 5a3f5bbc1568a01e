package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Plan-audit helper main: print a query's formatted physical plan and
  * its timed end-to-end cost through the noop sink. Usage:
  *   runMain graft.Explain <query>[,<query>...] [sfDir] [reps]
  * This is the ".explain and iterate" loop the build brief prescribes,
  * packaged so it needs no REPL (the sbt console chokes on pasted
  * multiline code under batch mode).
  *
  * Every rep also prints a per-JOB timing table (job id, wall seconds,
  * number of stages/tasks, first line of the job's callsite) — the
  * fastest way to see whether a query's wall time is one big stage or
  * fifty tiny scheduling round-trips (the superstep-query signature).
  */
object Explain {

  private final class JobTimer extends SparkListener {
    case class J(id: Int, start: Long, var end: Long = -1L,
        var site: String = "", var nStages: Int = 0)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, J]
    override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
      val j = J(js.jobId, js.time)
      j.site = Option(js.properties)
        .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
      j.nStages = js.stageInfos.size
      jobs(js.jobId) = j
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(je.jobId).foreach(_.end = je.time)
    }
    def report(): String = synchronized {
      val sb = new StringBuilder
      var tot = 0.0
      jobs.values.foreach { j =>
        val sec = if (j.end < 0) -1.0 else (j.end - j.start) / 1e3
        if (sec >= 0) tot += sec
        sb.append(f"  job ${j.id}%4d  ${sec}%7.3f s  stages=${j.nStages}%2d  ${j.site}%s%n")
      }
      sb.append(f"  -- ${jobs.size} jobs, sum of job walls ${tot}%.3f s%n")
      sb.toString
    }
    def reset(): Unit = synchronized { jobs.clear() }
  }

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
    val timer = new JobTimer
    spark.sparkContext.addSparkListener(timer)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name ($sfDir) ====")
      df.explain("formatted")
      (1 to reps).foreach { r =>
        timer.reset()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[explain] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        spark.catalog.clearCache()
        Thread.sleep(200) // let listener events drain before reporting
        println(timer.report())
      }
    }
    spark.stop()
  }
}
