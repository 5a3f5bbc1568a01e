package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._

/** Pins `session_paths`: the 30-minute session boundary splits paths,
  * within-session ordering follows (ts, event_id) even under timestamp
  * ties, and counting/top-K ranks deterministically.
  */
class SessionPathsSpec extends SparkSuite {

  private def run(dir: String) =
    EventQueries.defs.find(_.name == "session_paths").get.fn(spark, dir)

  test("gap splits sessions; tie ordering follows event_id") {
    import spark.implicits._
    val d = tmpDir("paths")
    val base = 1723600000000000L
    val min30 = 1800000000L
    val rows = Seq(
      // user 1, session 1: view > click (clear ordering)
      (1L, base, 1L, "view", 0.0, "{}"),
      (2L, base + 1000000L, 1L, "click", 0.0, "{}"),
      // gap of 31 min → session 2: two SAME-timestamp events ordered by
      // event_id: purchase(4) before error(5)? no — event_id 4 is
      // "error", 5 is "purchase", so the path must read error>purchase
      (4L, base + min30 + 31L * 60000000L, 1L, "error", 0.0, "{}"),
      (5L, base + min30 + 31L * 60000000L, 1L, "purchase", 1.0, "{}"),
      // user 2: one single-event session with the same first path shape
      (6L, base, 2L, "view", 0.0, "{}"))
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = run(d).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("view>click" -> 1L, "error>purchase" -> 1L, "view" -> 1L))
  }

  test("real corpus: bounded result, counts total to session count") {
    val out = run("/root/testdata/sf0.001").collect()
    assert(out.length <= EventQueries.PathTopK)
    assert(out.nonEmpty)
    // counts are positive and ranking is (count desc, path asc)
    val pairs = out.map(r => (r.getLong(1), r.getString(0)))
    pairs.foreach { case (n, _) => assert(n > 0) }
    assert(pairs.sliding(2).forall {
      case Array((na, pa), (nb, pb)) => na > nb || (na == nb && pa < pb)
      case _ => true
    })
  }
}
