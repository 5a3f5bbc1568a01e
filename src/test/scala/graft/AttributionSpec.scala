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

  test("asof_forward: next purchase by (ts, event_id), NULL when none") {
    import spark.implicits._
    val d = tmpDir("asoffwd")
    val base = 1723600000000000L
    val hour = 3600000000L
    val rows = Seq(
      (1L, base, 1L, "click", 0.0, "{}"),
      (2L, base + hour, 1L, "purchase", 5.0, "{}"),
      (3L, base + 2 * hour, 1L, "purchase", 7.0, "{}"), // later: not the neighbor
      (4L, base + 3 * hour, 2L, "click", 0.0, "{}"), // no purchase ever
      // tie: purchase at the SAME instant with larger id counts as next
      (5L, base + 4 * hour, 3L, "click", 0.0, "{}"),
      (6L, base + 4 * hour, 3L, "purchase", 1.0, "{}"))
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = EventQueries.defs.find(_.name == "asof_forward").get
      .fn(spark, d).collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap
    assert(out(1L) == ((Some(2L), Some(hour)))) // earliest later purchase wins
    assert(out(4L) == ((None, None)))
    assert(out(5L) == ((Some(6L), Some(0L)))) // same-instant tie by event_id
  }

  test("rate_mosum: planted level shift flags, steady series does not") {
    import spark.implicits._
    val d = tmpDir("mosum")
    val base = 1723600000000000L
    val hour = 3600000000L
    // type 'steady': 10 events every hour for 48 hours → never shifts.
    // type 'shift': 10/hour for 40 hours, then 40/hour for 8 → the
    // trailing-6h mean must flag inside the elevated regime.
    def burst(tpe: String, hr: Int, n: Int, idBase: Long) =
      (0 until n).map(i => (idBase + hr * 100L + i,
        base + hr * hour + i * 1000000L, 1L, tpe, 0.0, "{}"))
    val rows =
      (0 until 48).flatMap(h => burst("steady", h, 10, 0L)) ++
        (0 until 40).flatMap(h => burst("shift", h, 10, 1000000L)) ++
        (40 until 48).flatMap(h => burst("shift", h, 40, 1000000L))
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = EventQueries.defs.find(_.name == "rate_mosum").get
      .fn(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val steady = out.filter(_._1 == "steady")
    assert(steady.nonEmpty && steady.forall(_._3 == 0L), "steady series must not flag")
    val shifted = out.filter(t => t._1 == "shift" && t._3 == 1L)
    assert(shifted.nonEmpty, "planted level shift must flag")
    // flags concentrate in the elevated regime (trailing windows that
    // include shifted hours)
    assert(shifted.forall(_._2 >= out.filter(_._1 == "shift").map(_._2).min + 40 - 5))
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

  test("two-phase prefix-sum plan equals the pair brute force, boundaries included") {
    // the r17 rewrite computes both aggregates as range sums over
    // per-user ordered streams (no pair materialization) — this pins
    // it cell-by-cell against a literal pair loop on a corpus built to
    // sit ON every boundary the lex/window rules define:
    //   - click at exactly p_us − W        -> in-window (inclusive)
    //   - click 1 us before that           -> out
    //   - click at p_us with c_id < p_id   -> counts (lex tie-break)
    //   - click at p_us with c_id > p_id   -> does not count
    //   - purchase at exactly c_us + W     -> credits the click
    //   - a hot user with many interleaved purchases sharing clicks
    import spark.implicits._
    val d = tmpDir("attr2p")
    val W = 7L * 24 * 3600000000L
    val base = 1723600000000000L
    val hour = 3600000000L
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String, Double)]()
    var id = 0L
    def add(us: Long, user: Long, tpe: String, v: Double, fixedId: Long = -1L): Long = {
      val e = if (fixedId >= 0) fixedId else { id += 1; id + 100L }
      rows += ((e, us, user, tpe, v))
      e
    }
    // user 1: boundary battery around one purchase (id 50) at base+2W
    add(base + W, 1L, "click", 0.0)           // exactly p_us − W: in
    add(base + W - 1, 1L, "click", 0.0)       // 1 us out
    add(base + 2 * W, 1L, "click", 0.0, 10L)  // same instant, lower id: in
    add(base + 2 * W, 1L, "click", 0.0, 90L)  // same instant, higher id: out
    add(base + 2 * W, 1L, "purchase", 10.0, 50L)
    // and a later purchase exactly W after the id-90 click
    add(base + 3 * W, 1L, "purchase", 5.0)
    // user 2: hot user — 120 interleaved clicks/purchases inside one window
    (0 until 120).foreach { i =>
      if (i % 3 == 2) add(base + i * hour, 2L, "purchase", 1.0 + i)
      else add(base + i * hour, 2L, "click", 0.0)
    }
    // user 3: purchase with no touches (alone), click with no purchase
    add(base, 3L, "purchase", 9.0)
    add(base + 10 * W, 3L, "click", 0.0)
    rows.toSeq.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    // literal pair brute force in Scala
    val ev = rows.toSeq
    val ps = ev.filter(_._4 == "purchase")
    val cs = ev.filter(_._4 == "click")
    def touches(p: (Long, Long, Long, String, Double)) = cs.filter { c =>
      c._3 == p._3 && c._2 >= p._2 - W &&
        (c._2 < p._2 || (c._2 == p._2 && c._1 < p._1))
    }
    val expect = cs.flatMap { c =>
      val infl = ps.filter(p => touches(p).exists(_._1 == c._1))
      if (infl.isEmpty) None
      else Some(c._1 -> (infl.size.toLong, infl.map { p =>
        val cents = math.floor(p._5 * 100.0 + 0.5).toLong // QueryDef.cents
        cents / touches(p).size
      }.sum))
    }.toMap
    val out = EventQueries.defs.find(_.name == "attribution_linear").get
      .fn(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === expect)
    // the tie-break boundary rows landed as designed: the lower-id
    // same-instant click is credited by purchase 50, the higher-id one
    // only by the later purchase
    assert(out(10L)._1 >= 1L && out(90L)._1 === 1L)
  }

  test("asof_nearest equals a driver-scale brute force; ties go backward") {
    val ev = Tables.events(spark, dir)
    def side(t: String): Array[(Long, Long, Long)] = ev
      .filter(col("event_type") === t)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val clicksByUser = side("click").groupBy(_._1)
    val expected = side("purchase").map { case (u, pid, pus) =>
      val cs = clicksByUser.getOrElse(u, Array.empty[(Long, Long, Long)])
      val back = cs.filter(c => c._3 < pus || (c._3 == pus && c._2 < pid))
        .sortBy(c => (-c._3, -c._2)).headOption
      val fwd = cs.filter(c => c._3 > pus || (c._3 == pus && c._2 > pid))
        .sortBy(c => (c._3, c._2)).headOption
      val pick = (back, fwd) match {
        case (None, None) => None
        case (Some(b), None) => Some((b, "back", pus - b._3))
        case (None, Some(f)) => Some((f, "fwd", f._3 - pus))
        case (Some(b), Some(f)) =>
          if (f._3 - pus < pus - b._3) Some((f, "fwd", f._3 - pus))
          else Some((b, "back", pus - b._3)) // tie → backward
      }
      (pid, u, pus, pick.map(_._1._2), pick.map(_._1._3),
        pick.map(_._2), pick.map(_._3))
    }.toSet
    val got = EventQueries.defs.find(_.name == "asof_nearest").get
      .fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.getString(5)),
        Option(r.get(6)).map(_.asInstanceOf[Long]))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // the corpus genuinely exercises both directions
    assert(got.exists(_._6.contains("back")) && got.exists(_._6.contains("fwd")))
  }
}
