package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._

/** Pins `attribution_linear`'s accounting: credit conservation (total
  * attributed cents never exceeds the touched purchases' revenue, and
  * the shortfall is exactly the floor-division remainders), and the
  * equal-share semantics on a hand-built user history.
  */
class AttributionSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("credit conservation against touched-purchase revenue") {
    import graft.queries.QueryDef.cents
    val out = EventQueries.defs.find(_.name == "attribution_linear").get
      .fn(spark, dir)
    val attributed = out.agg(sum(col("attributed_cents"))).head().getLong(0)

    // ground truth recomputed independently: per purchase with >= 1
    // touch, revenue cents and its floor-division remainder
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        unix_micros(col("ts")).as("p_us"), cents(col("value")).as("p_cents"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id"),
        unix_micros(col("ts")).as("c_us"))
    val touched = p.join(c, Seq("user_id"))
      .filter((col("c_us") < col("p_us") ||
        (col("c_us") === col("p_us") && col("c_id") < col("p_id"))) &&
        col("c_us") >= col("p_us") - lit(EventQueries.AttrWindowUs))
      .groupBy(col("p_id"), col("p_cents"))
      .agg(count(lit(1)).as("n"))
    val Array(total, remainder) = touched
      .agg(sum(col("p_cents")), sum(expr("p_cents % n")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray

    assert(attributed == total - remainder,
      s"attributed=$attributed touchedRevenue=$total remainders=$remainder")
    assert(attributed <= total)
  }

  test("equal shares on a hand-built history") {
    import spark.implicits._
    val d = tmpDir("attr")
    val base = 1723600000000000L // epoch micros, well past 1970
    val hour = 3600000000L
    // user 1: clicks at t0, t0+1h, then purchase of 9.99 at t0+2h
    //   → 999 cents over 2 touches: 499 each, 1 cent unassigned
    // user 2: click 10 days before purchase → outside the 7-day window
    val rows = Seq(
      (1L, base, 1L, "click", 0.0, "{}"),
      (2L, base + hour, 1L, "click", 0.0, "{}"),
      (3L, base + 2 * hour, 1L, "purchase", 9.99, "{}"),
      (4L, base, 2L, "click", 0.0, "{}"),
      (5L, base + 240 * hour, 2L, "purchase", 5.0, "{}"))
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = EventQueries.defs.find(_.name == "attribution_linear").get
      .fn(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> (1L, 499L), 2L -> (1L, 499L)))
  }
}
