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

  test("session_gap_dist: exact log2 buckets at the power boundaries, gaps conserved") {
    import spark.implicits._
    val d = tmpDir("gapdist")
    val base = 1723600000000000L // epoch micros
    def t(offsetS: Long) = base + offsetS * 1000000L
    // user 1: consecutive gaps 1 s, 2 s, 4 s, 5 s — bucket edges land
    //   exactly ON powers of two (2→bucket 1, 4→bucket 2, 5→bucket 2)
    // user 2: single event → contributes no gap
    // user 3: two events at the SAME timestamp → gap 0 → bucket 0
    val rows = Seq(
      (1L, t(0), 1L), (2L, t(1), 1L), (3L, t(3), 1L), (4L, t(7), 1L), (5L, t(12), 1L),
      (10L, t(0), 2L),
      (20L, t(0), 3L), (21L, t(0), 3L))
      .map { case (id, us, u) => (id, us, u, "click", 0.0, "{}") }
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = EventQueries.defs.find(_.name == "session_gap_dist").get
      .fn(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // 5 gaps total: bucket 0 ← {0 s, 1 s}, bucket 1 ← {2 s}, bucket 2 ← {4 s, 5 s}
    assert(got == Map(
      0L -> ((2L, 1L, 400L)),
      1L -> ((1L, 2L, 200L)),
      2L -> ((2L, 9L, 400L))), got.toString)
    // conservation on the real corpus: Σ n_gaps = Σ_user (n_events − 1)
    val dir = "/root/testdata/sf0.001"
    val hist = EventQueries.defs.find(_.name == "session_gap_dist").get
      .fn(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    val ev = Tables.events(spark, dir)
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(hist.map(_._2).sum == expected)
  }
}
