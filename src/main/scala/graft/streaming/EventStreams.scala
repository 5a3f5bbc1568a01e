package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming surface of the engine — a deliberate extension:
  * the reference is strictly batch/pull-based (SURVEY §2.8, `exec()`
  * runs to completion). The batch queries in
  * [[graft.queries.EventQueries]] are the oracle-checked twins of these
  * streaming plans; the transformations are the same Catalyst operators,
  * so a pipeline can move batch → streaming without rewriting logic.
  *
  * Scale notes: all stateful operators here key their state by
  * `user_id`/window — state is hash-partitioned across executors and
  * bounded by the watermark (late data beyond it is dropped and state
  * evicted), which is what keeps 100 TB/day streams from accreting
  * unbounded state.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based stream over an events directory (new parquet files are
    * discovered per micro-batch). `maxFilesPerTrigger` bounds batch
    * size — the streaming analog of the reference's extract batchSize.
    *
    * File streams need the schema up front, and the testdata's `ts` has
    * shipped with different physical encodings across generations
    * (int64 nanos, `timestamp[us]` NTZ, session-zoned TIMESTAMP). By
    * default (`nanosTs = None`) the encoding is DETECTED from the
    * directory's parquet footers with a one-time batch schema probe —
    * a driver-side metadata read, no data scan — and normalized to a
    * microsecond `TimestampType` column, matching the batch path
    * ([[graft.Tables.events]]). Pass `Some(true)` to force the legacy
    * nanos-as-long decode, `Some(false)` to skip the probe for ordinary
    * Spark-written timestamp parquet.
    *
    * The probe tolerates a missing/empty directory (the normal
    * consumer-before-producer stream deployment order) by falling back
    * to the standard `TimestampType` schema and letting the stream
    * wait for files — a legacy nanos producer that starts AFTER the
    * consumer must state `Some(true)` explicitly, since no footer
    * existed to detect it from. The `nanosAsLong` session conf is set
    * only on the paths that read nano footers (probe and forced-nanos)
    * — never as a side effect of an ordinary timestamp stream. */
  def readEventStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 4, nanosTs: Option[Boolean] = None): DataFrame = {
    def enableNanosDecode(): Unit =
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType: DataType = nanosTs match {
      case Some(true) =>
        enableNanosDecode()
        LongType
      case Some(false) => TimestampType
      case None =>
        // the probe itself must survive nano footers, so the decode
        // conf is enabled for its duration — but it must not LEAK: if
        // the footer turns out to be an ordinary TIMESTAMP (or the
        // directory is missing), restore the prior value, else later
        // unrelated batch reads of nanos-footer parquet in this session
        // would silently decode as LongType instead of failing loudly.
        // It stays enabled ONLY when the probe actually finds INT64
        // nanos (the stream's own micro-batch reads then need it).
        val key = "spark.sql.legacy.parquet.nanosAsLong"
        val prior = spark.conf.getOption(key)
        def restore(): Unit = prior match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
        enableNanosDecode()
        val probed =
          try {
            try spark.read.parquet(dir).schema("ts").dataType
            catch {
              case e: org.apache.spark.sql.AnalysisException
                  if e.getErrorClass != null &&
                    (e.getErrorClass.startsWith("PATH_NOT_FOUND") ||
                      e.getErrorClass.startsWith("UNABLE_TO_INFER_SCHEMA")) =>
                TimestampType
            }
          } catch { case e: Throwable => restore(); throw e }
        if (probed != LongType) restore()
        probed
    }
    def stream(withTs: DataType): DataFrame = spark.readStream
      .schema(StructType(eventSchema.map {
        case f if f.name == "ts" => f.copy(dataType = withTs)
        case f => f
      }))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
    tsType match {
      case LongType =>
        // integer `div`, NOT `/`: epoch-nanos (~1.7e18) exceed a
        // double's 2^53 integer range
        stream(LongType).withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => stream(TimestampType)
      case TimestampNTZType =>
        // UTC session: cast changes the schema, not the instant
        stream(TimestampNTZType).withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalArgumentException(
          s"events stream at $dir: unsupported ts type $other (expected " +
            "INT64 nanos, TIMESTAMP, or TIMESTAMP_NTZ)")
    }
  }

  /** Watermarked tumbling-window aggregation — the streaming twin of
    * the batch `events_hourly` query. Late events beyond the watermark
    * are dropped; window state is evicted once the watermark passes. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        // integer cents before summing, per the engine-wide numeric
        // policy (QueryDef.cents): a double sum's low bits vary with
        // micro-batch/partition order; a BIGINT cents sum never does
        sum(graft.queries.QueryDef.cents(col("value"))).as("sum_value_cents"),
        approx_count_distinct(col("user_id")).as("approx_users"))

  /** Watermarked SLIDING-window aggregation (1 h window every 15 min):
    * each event contributes to window-length/slide = 4 overlapping
    * windows — the window() generator fans the row out before the agg,
    * so state holds 4 open windows per key instead of 1; eviction is
    * still watermark-driven. Batch twin: `events_sliding`. */
  def slidingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(graft.queries.QueryDef.cents(col("value"))).as("sum_value_cents"))

  /** Streaming twin of the batch `rate_anomaly` query: live hourly
    * counts flagged against a FROZEN per-type baseline of historical
    * count moments (event_type, n, s, ss) — the production shape,
    * where the control chart's limits come from yesterday's batch job
    * and the stream only compares. Same float-free 3-sigma contract:
    * (n·c − S)² > 9·(n·SS − S²), every term BIGINT-exact.
    *
    * Structure note: the static baseline joins BEFORE the windowed
    * aggregation (carried through via min(), constant per type) —
    * Spark does not allow joins after a streaming aggregation, and the
    * pre-agg stream-static broadcast join is the supported, cheaper
    * plan anyway. */
  def rateAnomalyStream(events: DataFrame, baseline: DataFrame,
      watermark: String = "2 hours"): DataFrame = {
    // decimal cross products — the batch rate_anomaly discipline: c²
    // saturates a BIGINT at c ≈ 3e9 events/hour, exactly live-stream
    // scale, so dev², n·SS and S² all run in DECIMAL(38,0)
    val dev = col("n").cast("decimal(38,0)") * col("n_events") - col("s")
    events
      .withWatermark("ts", watermark)
      .join(broadcast(baseline), Seq("event_type"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("n")).as("n"), min(col("s")).as("s"), min(col("ss")).as("ss"))
      .select(col("window"), col("event_type"), col("n_events"),
        when(dev * dev > lit(9L) *
            (col("n") * col("ss").cast("decimal(38,0)") -
              col("s").cast("decimal(38,0)") * col("s")), 1L)
          .otherwise(0L).as("is_spike"),
        when(dev > 0, lit("high")).otherwise(lit("low")).as("tail"))
  }

  /** [[rateMosumStream]] state per event type: the OPEN hour being
    * accumulated (`openHr` = MinValue when none) and the trailing
    * ≤ W most-recently-CLOSED observed hours — O(W) per key, forever
    * (a |types|-cardinality key space needs no eviction). */
  final case class MosumState(openHr: Long, openC: Long,
      hist: List[(Long, Long)])
  final case class MosumOut(event_type: String, hr: Long, t6: Long, shifted: Long)

  /** Streaming MOSUM mean-shift detection — the streaming twin of the
    * batch `rate_mosum` query, against FROZEN per-type count moments
    * (n, s, ss) from the historical batch job (the [[rateAnomalyStream]]
    * production shape: yesterday's batch sets the control limits, the
    * stream only compares; the moment frame is |types| rows, so it
    * rides in as a plain broadcast-sized map). Same float-free
    * contract, in BigInt — the JVM twin of the batch DECIMAL(38,0)
    * headroom: (n·T − W·S)² > 9·W·(n·SS − S²).
    *
    * Why flatMapGroupsWithState and not a windowed agg: the trailing-W
    * sum needs the previous W−1 OBSERVED hours' counts next to each
    * closing hour — cross-window state no window aggregation carries.
    * An hour EMITS when it closes: a later-hour event arrives, or the
    * event-time timeout fires once the watermark passes the open
    * hour's end (so the stream's last hour is not held hostage). Rows
    * appear once, append-mode, exactly the batch rows for in-order
    * data (StreamingSpec pins the equality, timeout flush included).
    *
    * Divergence by construction (the bounded-state twin contract): a
    * late row landing BEHIND its type's open hour folds into the open
    * hour (arrival-order accounting — the batch plan, seeing all
    * data, recounts the true hour), and hours the frozen map lacks a
    * moment row for pass through silently. */
  def rateMosumStream(events: Dataset[Event],
      moments: Map[String, (Long, Long, Long)], w: Int = 6,
      watermark: String = "2 hours"): Dataset[MosumOut] = {
    import events.sparkSession.implicits._
    def ms(t: java.sql.Timestamp): Long = t.getTime
    val hourMs = 3600000L
    val none = Long.MinValue

    def stat(tpe: String, hr: Long, hist: List[(Long, Long)]): Option[MosumOut] =
      if (hist.size < w) None
      else moments.get(tpe).map { case (n, s, ss) =>
        val t6 = hist.map(_._2).sum
        val dev = BigInt(n) * t6 - BigInt(w) * s
        val bound = BigInt(9) * w * (BigInt(n) * ss - BigInt(s) * s)
        MosumOut(tpe, hr, t6, if (dev * dev > bound) 1L else 0L)
      }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[MosumState, MosumOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (tpe: String, rows: Iterator[Event], state: GroupState[MosumState]) =>
          var st = state.getOption.getOrElse(MosumState(none, 0L, Nil))
          val out = Seq.newBuilder[MosumOut]
          // close the open hour: fold it into the trailing history and
          // emit its MOSUM row once W observed hours are in hand
          def close(): Unit = if (st.openHr != none) {
            val hist = (st.hist :+ ((st.openHr, st.openC))).takeRight(w)
            stat(tpe, st.openHr, hist).foreach(out += _)
            st = MosumState(none, 0L, hist.takeRight(w - 1))
          }
          if (!state.hasTimedOut) {
            rows.toSeq.sortBy(e => (ms(e.ts), e.event_id)).foreach { e =>
              val hr = ms(e.ts) / hourMs
              if (st.openHr == none) st = st.copy(openHr = hr, openC = 1L)
              else if (hr == st.openHr || hr < st.openHr)
                // late-behind-open rows fold in (documented divergence)
                st = st.copy(openC = st.openC + 1L)
              else { close(); st = st.copy(openHr = hr, openC = 1L) }
            }
          }
          // finalize by watermark — on timeout fire AND inline (an
          // open hour whose end the watermark already passed can never
          // arm a future timer: re-arming at-or-before it throws)
          val wm = state.getCurrentWatermarkMs()
          if (st.openHr != none && (st.openHr + 1) * hourMs <= wm) close()
          state.update(st)
          if (st.openHr != none) state.setTimeoutTimestamp((st.openHr + 1) * hourMs)
          out.result().iterator
      }
  }

  /** Session windows via the built-in `session_window` (30-minute gap)
    * — the declarative path, preferred when the semantics fit. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))

  /** Streaming exactly-once-per-key dedup: drops events whose `event_id`
    * was already seen, keeping state only within the watermark horizon
    * (the streaming twin of the batch `dedup_exact` operator — and the
    * ingest-side guard every training-data pipeline needs against
    * at-least-once sources). */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join: clicks enriched with the purchase that
    * followed within an hour, both sides watermarked so join state is
    * evicted (unbounded state = the classic stream-join failure at
    * scale; the time-range condition is what bounds it). */
  def clickToPurchase(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(purchases,
      expr("""user_id = p_user_id AND
              purchase_ts >= click_ts AND
              purchase_ts <= click_ts + INTERVAL 1 HOUR"""))
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))
  }

  /** Stream-STATIC join: each streaming event enriched against a batch
    * dimension table — the lookup-enrichment shape (user → segment,
    * doc → source metadata) every ingest pipeline runs before its
    * stateful stages. No watermark is needed and NO state accretes:
    * the static side is just a batch plan re-bound per micro-batch, so
    * a small dim rides a broadcast hash join (the planner sees its
    * size) and a huge dim degrades to a per-batch shuffle join — the
    * same policy as batch. Dim UPDATES between micro-batches are
    * visible only for re-scanned sources (file-source static sides
    * cache their file listing; a Delta/JDBC dim re-reads). */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      key: String = "user_id"): DataFrame =
    events.join(dim, Seq(key), "left_outer")

  /** Stream-stream LEFT OUTER join: every click, enriched with its
    * following purchase when one exists, or NULL purchase columns once
    * the watermark proves none can arrive. Outer stream joins are the
    * harder state problem: the engine must hold an unmatched left row
    * until the watermark passes the end of its join window before it
    * may emit the NULL-padded result — so the same watermark + time-
    * range bounds that evict inner-join state are what make the outer
    * result *correct*, not just space-bounded. */
  def clickToPurchaseOuter(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(purchases,
      expr("""user_id = p_user_id AND
              purchase_ts >= click_ts AND
              purchase_ts <= click_ts + INTERVAL 1 HOUR"""),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))
  }

  /** Stream-stream FULL OUTER join: every click AND every purchase
    * survives — matched pairs emit immediately; each side's unmatched
    * rows emit NULL-padded only once the watermark proves no partner
    * can arrive. This doubles the LEFT OUTER state obligation: BOTH
    * sides hold their unmatched rows until the watermark passes the
    * end of their join window (clicks wait out [click_ts, click_ts+1h];
    * purchases wait out [purchase_ts-1h, purchase_ts]), and since the
    * watermark is tracked per input and advances on the SLOWEST side,
    * one stalled side delays the other side's NULL emission too — the
    * correctness property StreamingSpec pins per side. */
  def clickToPurchaseFullOuter(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(purchases,
      expr("""user_id = p_user_id AND
              purchase_ts >= click_ts AND
              purchase_ts <= click_ts + INTERVAL 1 HOUR"""),
      "full_outer")
      .select(col("user_id").as("click_user"), col("click_id"), col("click_ts"),
        col("p_user_id").as("purchase_user"), col("purchase_ts"), col("purchase_value"))
  }

  final case class ClickState(clickMs: Long, clickId: Long)
  final case class AttributionOut(purchase_id: Long, user_id: Long,
      purchase_ms: Long, click_id: Option[Long], click_ms: Option[Long])

  /** Streaming last-touch attribution — the streaming twin of the batch
    * `asof_attribution` as-of join: each purchase is attributed to the
    * latest click by the same user at-or-before it (ties on equal
    * timestamps resolved by event_id, like the batch query).
    *
    * State is ONE (clickMs, clickId) pair per user — the as-of join's
    * "carry the latest left row forward" made explicit — keyed by
    * user_id so it hash-partitions across executors, and evicted by an
    * event-time timeout `ttlMs` past the last click (an attribution
    * window: a click older than the TTL no longer attributes, which is
    * both the business rule and what bounds state).
    *
    * Streaming divergence from the batch twin, by construction: a
    * purchase is attributed against the clicks SEEN when its
    * micro-batch is processed — a click arriving later (late data
    * within the watermark) cannot retro-attribute an already-emitted
    * purchase. In-order streams reproduce the batch result exactly
    * (pinned in StreamingSpec). */
  def attributeStateful(events: Dataset[Event],
      ttlMs: Long = 24L * 3600 * 1000,
      watermark: String = "2 hours"): Dataset[AttributionOut] = {
    import events.sparkSession.implicits._
    def ms(t: java.sql.Timestamp): Long = t.getTime
    def before(aMs: Long, aId: Long, bMs: Long, bId: Long): Boolean =
      aMs < bMs || (aMs == bMs && aId < bId)

    events
      .filter(e => e.event_type == "click" || e.event_type == "purchase")
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ClickState, AttributionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[ClickState]) =>
          if (state.hasTimedOut) {
            // attribution window expired: forget the click, emit nothing
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (ms(e.ts), e.event_id))
            val out = Seq.newBuilder[AttributionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = ms(e.ts)
              if (e.event_type == "click") {
                // keep the MAX (ts, id) click — a late click within the
                // watermark must not regress the carried state
                if (cur.forall(c => before(c.clickMs, c.clickId, t, e.event_id)))
                  cur = Some(ClickState(t, e.event_id))
              } else {
                // the TTL is enforced HERE, in event time, not only via
                // state-timeout eviction: eviction is micro-batch-
                // granular, so a purchase can race an expired click into
                // the same batch — without this check the attribution
                // would depend on batch boundaries
                val att = cur.filter(c =>
                  before(c.clickMs, c.clickId, t, e.event_id) && t - c.clickMs <= ttlMs)
                out += AttributionOut(e.event_id, userId, t,
                  att.map(_.clickId), att.map(_.clickMs))
              }
            }
            cur match {
              // re-arming a timeout at-or-before the current watermark
              // throws (and would crash the whole query) — a click whose
              // window the watermark already passed attributes nothing
              // ever again, so drop the state instead
              case Some(c) if c.clickMs + ttlMs > state.getCurrentWatermarkMs() =>
                state.update(c)
                state.setTimeoutTimestamp(c.clickMs + ttlMs)
              case Some(_) => state.remove()
              case None => ()
            }
            out.result().iterator
          }
      }
  }

  /** Pending clicks awaiting their first following purchase, for
    * [[attributeForwardStateful]]. */
  final case class PendingClicks(clicks: Seq[ClickState])
  final case class ForwardAttributionOut(click_id: Long, user_id: Long,
      click_ms: Long, purchase_id: Option[Long], purchase_ms: Option[Long],
      latency_ms: Option[Long])

  /** Streaming FORWARD attribution — the streaming twin of the batch
    * `asof_forward` query: each click is matched to the user's EARLIEST
    * purchase strictly after it in (ts, event_id) order, with the
    * conversion latency; a click whose `horizonMs` passes with no
    * purchase emits a NULL row (the batch query accounts for every
    * click, so the twin does too).
    *
    * State is the user's PENDING clicks — those whose following
    * purchase hasn't arrived — keyed by user_id so it hash-partitions
    * across executors. The horizon is what bounds it: a purchase
    * flushes every pending click before it in one pass, and the
    * event-time timeout (armed at the EARLIEST pending click's expiry)
    * sweeps the rest, so state per user never exceeds one horizon's
    * worth of unconverted clicks. The horizon is enforced in EVENT
    * time at match point too, not only via timeout eviction — eviction
    * is micro-batch-granular, and a purchase can race an expired click
    * into the same batch (same guard as [[attributeStateful]]).
    *
    * Streaming divergence from the batch twin, by construction: a
    * purchase arriving LATE (within the watermark but after a later
    * purchase was already processed) cannot claim clicks the earlier-
    * processed purchase already flushed. In-order streams reproduce
    * the batch result exactly for clicks converting within the horizon
    * (pinned in StreamingSpec). */
  def attributeForwardStateful(events: Dataset[Event],
      horizonMs: Long = 24L * 3600 * 1000,
      watermark: String = "2 hours"): Dataset[ForwardAttributionOut] = {
    import events.sparkSession.implicits._
    def ms(t: java.sql.Timestamp): Long = t.getTime
    def before(aMs: Long, aId: Long, bMs: Long, bId: Long): Boolean =
      aMs < bMs || (aMs == bMs && aId < bId)

    events
      .filter(e => e.event_type == "click" || e.event_type == "purchase")
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PendingClicks, ForwardAttributionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[PendingClicks]) =>
          val out = Seq.newBuilder[ForwardAttributionOut]
          var pending = state.getOption.map(_.clicks.toVector).getOrElse(Vector.empty)
          if (!state.hasTimedOut) {
            rows.toSeq.sortBy(e => (ms(e.ts), e.event_id)).foreach { e =>
              val t = ms(e.ts)
              if (e.event_type == "click")
                pending :+= ClickState(t, e.event_id)
              else {
                // this purchase is the first-following for every pending
                // click strictly before it; clicks past the horizon NULL
                // out here rather than wait for the timeout sweep
                val (flushed, waiting) = pending.partition(c =>
                  before(c.clickMs, c.clickId, t, e.event_id))
                flushed.foreach { c =>
                  if (t - c.clickMs <= horizonMs)
                    out += ForwardAttributionOut(c.clickId, userId, c.clickMs,
                      Some(e.event_id), Some(t), Some(t - c.clickMs))
                  else
                    out += ForwardAttributionOut(c.clickId, userId, c.clickMs,
                      None, None, None)
                }
                pending = waiting
              }
            }
          }
          // unified expiry sweep (timeout fire AND inline): emit NULL
          // rows for clicks whose horizon the watermark has passed —
          // doing it inline also keeps the re-arm below strictly beyond
          // the current watermark (re-arming at-or-before it throws)
          val wm = state.getCurrentWatermarkMs()
          val (expired, live) = pending.partition(c => c.clickMs + horizonMs <= wm)
          expired.sortBy(c => (c.clickMs, c.clickId)).foreach(c =>
            out += ForwardAttributionOut(c.clickId, userId, c.clickMs, None, None, None))
          if (live.nonEmpty) {
            state.update(PendingClicks(live))
            state.setTimeoutTimestamp(live.map(c => c.clickMs + horizonMs).min)
          } else state.remove()
          out.result().iterator
      }
  }

  /** Per-user last-event state for [[transitionsStateful]]: epoch ms,
    * tie-break id, and type of the latest event consumed. */
  final case class LastEvent(ms: Long, id: Long, tpe: String)
  final case class TransitionOut(user_id: Long, from_type: String,
      to_type: String, to_ms: Long)

  /** Stateful event-transition pairs — the streaming twin of the batch
    * `event_transitions` query (per-user consecutive (from, to) event
    * pairs under the (ts, event_id) total order; downstream
    * `groupBy(from_type, to_type).count()` is the live Markov matrix
    * behind funnel design).
    *
    * State is ONE (ms, id, type) triple per user — O(1) per key,
    * hash-partitioned on user_id — evicted once the watermark passes
    * `last + idleMs` (nothing to emit at timeout: pairs emit inline as
    * their second event arrives, so eviction is purely a state bound).
    * Within a micro-batch rows fold in (ts, event_id) order, matching
    * the batch window's sort. Divergence by construction (the
    * bounded-state contract every twin here documents): an event
    * arriving between two already-paired events — late but within the
    * watermark, delivered in a later micro-batch — appends to the
    * carried last event instead of splicing between them; the batch
    * twin, seeing all data at once, would order it in place. */
  def transitionsStateful(events: Dataset[Event],
      idleMs: Long = 2L * 60 * 60 * 1000,
      watermark: String = "2 hours"): Dataset[TransitionOut] = {
    import events.sparkSession.implicits._
    def ms(t: java.sql.Timestamp): Long = t.getTime

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, TransitionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (ms(e.ts), e.event_id))
            val out = Seq.newBuilder[TransitionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = ms(e.ts)
              // an out-of-order row at-or-before the carried last event
              // (same-batch rows are sorted, so only cross-batch late
              // data hits this) still pairs — in arrival order, per the
              // documented divergence — but must not REGRESS the
              // carried (ms, id) watermark clock
              cur.foreach(p => out += TransitionOut(userId, p.tpe, e.event_type, t))
              if (cur.forall(p => p.ms < t || (p.ms == t && p.id < e.event_id)))
                cur = Some(LastEvent(t, e.event_id, e.event_type))
            }
            cur match {
              // the attributeStateful arming guard: a timeout at-or-
              // before the current watermark throws — an idle user the
              // watermark already passed just drops state now
              case Some(c) if c.ms + idleMs > state.getCurrentWatermarkMs() =>
                state.update(c)
                state.setTimeoutTimestamp(c.ms + idleMs)
              case Some(_) => state.remove()
              case None => ()
            }
            out.result().iterator
          }
      }
  }

  /** State-API-v2 processor behind [[attributeForwardStreamV2]] — the
    * same first-following-purchase fold as [[attributeForwardStateful]]
    * with the pending-click queue in a LISTSTATE (clear / appendList /
    * get round-trips through RocksDB — the v2 primitive the Value- and
    * Map-state ports don't reach) and the v1 timeout slot replaced by
    * a [[TimerHygiene]]-managed event-time timer. The expiry handler
    * re-runs the same horizon sweep the inline path uses, so a stale
    * timer can only ever expire clicks whose horizon the watermark has
    * genuinely passed. */
  private class ForwardAttributionProcessor(horizonMs: Long)
      extends StatefulProcessor[Long, Event, ForwardAttributionOut]
      with TimerHygiene {
    @transient private var pending: org.apache.spark.sql.streaming.ListState[ClickState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[ClickState]("pending",
        org.apache.spark.sql.Encoders.product[ClickState], TTLConfig.NONE)
      initArmed()
    }

    private def before(aMs: Long, aId: Long, bMs: Long, bId: Long): Boolean =
      aMs < bMs || (aMs == bMs && aId < bId)

    /** NULL-flush every pending click whose horizon the watermark has
      * passed; returns the still-live remainder. */
    private def sweep(userId: Long, p: Vector[ClickState], wm: Long,
        out: scala.collection.mutable.Builder[ForwardAttributionOut, Seq[ForwardAttributionOut]]): Vector[ClickState] = {
      val (expired, live) = p.partition(c => c.clickMs + horizonMs <= wm)
      expired.sortBy(c => (c.clickMs, c.clickId)).foreach(c =>
        out += ForwardAttributionOut(c.clickId, userId, c.clickMs, None, None, None))
      live
    }

    /** Persist the live queue and keep exactly one timer at the
      * earliest horizon (or none when the queue drained). */
    private def store(live: Vector[ClickState]): Unit = {
      pending.clear()
      if (live.nonEmpty) {
        pending.appendList(live.toArray)
        rearmTimer(live.map(c => c.clickMs + horizonMs).min)
      } else disarmTimer()
    }

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[ForwardAttributionOut] = {
      val out = Seq.newBuilder[ForwardAttributionOut]
      var p = pending.get().toVector
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val t = e.ts.getTime
        if (e.event_type == "click") p :+= ClickState(t, e.event_id)
        else {
          val (flushed, waiting) = p.partition(c =>
            before(c.clickMs, c.clickId, t, e.event_id))
          flushed.foreach { c =>
            if (t - c.clickMs <= horizonMs)
              out += ForwardAttributionOut(c.clickId, userId, c.clickMs,
                Some(e.event_id), Some(t), Some(t - c.clickMs))
            else
              out += ForwardAttributionOut(c.clickId, userId, c.clickMs,
                None, None, None)
          }
          p = waiting
        }
      }
      store(sweep(userId, p, tv.getCurrentWatermarkInMs(), out))
      out.result().iterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ForwardAttributionOut] = {
      clearArmed() // this timer just fired; the slot is free
      val out = Seq.newBuilder[ForwardAttributionOut]
      val wm = math.max(info.getExpiryTimeInMs(), tv.getCurrentWatermarkInMs())
      store(sweep(userId, pending.get().toVector, wm, out))
      out.result().iterator
    }
  }

  /** State-API-v2 twin of [[attributeForwardStateful]]
    * (`transformWithState`, RocksDB, ListState + stale-guarded timers).
    * With the Value-state ports (sessionize/funnel/gap/transitions),
    * the Bloom bitmap, and the heavy-hitter MapState, this closes v2
    * coverage of ALL THREE keyed-state primitives. StreamingSpec pins
    * it row-equal to the v1 twin (conversion, tie, and horizon-NULL
    * paths) and exactly-once across a RocksDB checkpoint restart.
    * Scale posture is v1's: pending clicks per user bounded by the
    * horizon, one pending timer per key. */
  def attributeForwardStreamV2(events: Dataset[Event],
      horizonMs: Long = 24L * 3600 * 1000,
      watermark: String = "2 hours"): Dataset[ForwardAttributionOut] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "click" || e.event_type == "purchase")
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new ForwardAttributionProcessor(horizonMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  final case class TransitionEv(user_id: Long, ts: java.sql.Timestamp,
      from_type: String, to_type: String)

  /** Timer hygiene for the state-API-v2 processors. v2 timers are NOT
    * the single-slot v1 `setTimeoutTimestamp`: every `registerTimer`
    * call ADDS a pending timer, so a processor that re-arms each
    * micro-batch hands an always-active user one pending timer per
    * batch inside its idle window — correctness survives (the expiry
    * handlers re-check the CURRENT state's horizon before evicting),
    * but timer-store state grows with batch rate, not key count.
    * Tracking the last armed expiry in a ValueState lets a re-arm
    * DELETE the superseded timer and skip the no-op re-arm entirely,
    * holding pending timers at ≤ 1 per key. */
  private trait TimerHygiene { this: StatefulProcessor[_, _, _] =>
    @transient private var armedMs: ValueState[Long] = _
    protected def initArmed(): Unit =
      armedMs = getHandle.getValueState[Long]("armedMs",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    protected def rearmTimer(expiryMs: Long): Unit = {
      val prev = if (armedMs.exists()) Some(armedMs.get()) else None
      if (!prev.contains(expiryMs)) {
        prev.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(expiryMs)
        armedMs.update(expiryMs)
      }
    }
    protected def clearArmed(): Unit = armedMs.clear()
    /** Inline full-clear: delete the pending timer too (clearArmed alone
      * leaves it to fire as a guarded no-op — harmless but it would
      * double-arm the key if a later re-arm lands first). */
    protected def disarmTimer(): Unit = {
      if (armedMs.exists()) getHandle.deleteTimer(armedMs.get())
      armedMs.clear()
    }
  }

  /** State-API-v2 twin of [[transitionsStateful]]'s fold, emitting the
    * pair WITH its event time so the output can feed further stateful
    * operators (see [[GapDistProcessor]] for the v1-vs-v2 contrast). */
  private class TransitionProcessor(idleMs: Long)
      extends StatefulProcessor[Long, Event, TransitionEv] with TimerHygiene {
    @transient private var last: ValueState[LastEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      last = getHandle.getValueState[LastEvent]("last",
        org.apache.spark.sql.Encoders.product[LastEvent], TTLConfig.NONE)
      initArmed()
    }

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[TransitionEv] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val out = Seq.newBuilder[TransitionEv]
      var cur = if (last.exists()) Some(last.get()) else None
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur.foreach(p => out += TransitionEv(userId, e.ts, p.tpe, e.event_type))
        if (cur.forall(p => p.ms < t || (p.ms == t && p.id < e.event_id)))
          cur = Some(LastEvent(t, e.event_id, e.event_type))
      }
      cur.foreach { c =>
        last.update(c)
        rearmTimer(c.ms + idleMs)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[TransitionEv] = {
      // stale-timer guard (the GapDistProcessor rule): a timer armed
      // by an older batch must not evict a user who has since spoken
      if (last.exists() && last.get().ms + idleMs <= info.getExpiryTimeInMs()) {
        last.clear(); clearArmed()
      }
      Iterator.empty
    }
  }

  /** The LIVE Markov matrix in one query — `event_transitions`' final
    * shape (from_type, to_type, n), not just the pair stream:
    * [[transitionsStateful]]'s scaladoc promises "downstream
    * groupBy(from, to).count()" as the consumer's step because the v1
    * state API cannot chain it; this is that step done IN-QUERY via
    * [[TransitionProcessor]] under `transformWithState` with `ts`
    * declared as the output's event time. Agg state = the
    * |types|²-key count grid — bounded by construction, map-side
    * combinable, exactly the batch plan's shuffle shape. Requires the
    * RocksDB state store (state-API-v2 constraint). Update-mode
    * emission: the current matrix row versions per micro-batch. */
  def transitionMatrixStream(events: Dataset[Event],
      idleMs: Long = 2L * 60 * 60 * 1000,
      watermark: String = "2 hours"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor(idleMs), "ts", OutputMode.Append())
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  final case class GapOut(user_id: Long, ts: java.sql.Timestamp,
      gap_s: Long, bucket: Long)

  /** Streaming inter-event gaps — the streaming half of the batch
    * `session_gap_dist` twin (the sessionization-timeout tuning
    * curve): per-user consecutive-event gap seconds with their
    * floor(log₂ gap_s) bucket, emitted as each successor event
    * arrives. State is the [[transitionsStateful]] shape — ONE
    * (ms, id, type) triple per user, hash-partitioned on user_id,
    * watermark-evicted after `idleMs` idle. The bucket is the batch
    * column's JVM twin: length(bin(gap_s)) − 1 =
    * 63 − numberOfLeadingZeros, never a float log.
    *
    * The histogram rollup lives in [[gapHistogram]], applied per sink
    * batch (`foreachBatch` + upsert, the repo's streaming-JDBC
    * pattern) or over any collected slice: Spark's global-watermark
    * correctness checker categorically rejects a streaming
    * aggregation downstream of `flatMapGroupsWithState` (the emitted
    * rows are "late" to the second stateful operator, whatever their
    * carried event time), so the honest streaming contract — same
    * reasoning as [[heavyHittersStream]]'s candidates-only contract —
    * is per-gap emission plus a trivially-mergeable ≤ ~40-key
    * read-side fold: bucket counts are associative/commutative, so
    * ANY downstream accumulation (per-batch upsert, cross-shard
    * merge) lands on the batch query's numbers. StreamingSpec pins
    * exactly that composition against the oracle-gated batch rows.
    *
    * Divergence by construction (the bounded-state contract every twin
    * documents): a late row delivered in a later micro-batch — within
    * the watermark but behind its user's carried last event — pairs in
    * ARRIVAL order (the batch plan, seeing all data, would splice it
    * in place), with the gap floored at 0 so the two's-complement
    * bucket of a negative difference can never appear. */
  def sessionGapsStream(events: Dataset[Event],
      idleMs: Long = 2L * 60 * 60 * 1000,
      watermark: String = "2 hours"): Dataset[GapOut] = {
    import events.sparkSession.implicits._
    def ms(t: java.sql.Timestamp): Long = t.getTime
    def bucketOf(gapS: Long): Long =
      if (gapS <= 0L) 0L else 63L - java.lang.Long.numberOfLeadingZeros(gapS)

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, GapOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (ms(e.ts), e.event_id))
            val out = Seq.newBuilder[GapOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = ms(e.ts)
              cur.foreach { p =>
                val g = math.max(0L, (t - p.ms) / 1000L)
                out += GapOut(userId, e.ts, g, bucketOf(g))
              }
              // never regress the carried (ms, id) clock (late-row rule)
              if (cur.forall(p => p.ms < t || (p.ms == t && p.id < e.event_id)))
                cur = Some(LastEvent(t, e.event_id, e.event_type))
            }
            cur match {
              case Some(c) if c.ms + idleMs > state.getCurrentWatermarkMs() =>
                state.update(c)
                state.setTimeoutTimestamp(c.ms + idleMs)
              case Some(_) => state.remove()
              case None => ()
            }
            out.result().iterator
          }
      }
  }

  /** State-API-v2 processor behind [[sessionGapDistStream]]: the same
    * per-user (ms, id, type) fold as [[sessionGapsStream]], expressed
    * as a `StatefulProcessor` so the emitted rows carry a DECLARED
    * event-time column — the property that lets a downstream stateful
    * aggregation chain legally (the arbitrary-state API v1 cannot
    * declare one, which is why the fMGWS twin needs its read-side
    * rollup). State: ONE ValueState[LastEvent] per user. Eviction:
    * an event-time timer at last+idleMs; because a fresh timer is
    * registered per batch and stale ones still fire, the expiry
    * handler re-checks the CURRENT state's horizon before clearing —
    * an early-firing stale timer must not evict a user who has since
    * spoken (and [[TimerHygiene]] deletes the superseded timer on
    * re-arm, so pending timers stay ≤ 1 per key). */
  private class GapDistProcessor(idleMs: Long)
      extends StatefulProcessor[Long, Event, GapOut] with TimerHygiene {
    @transient private var last: ValueState[LastEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      last = getHandle.getValueState[LastEvent]("last",
        org.apache.spark.sql.Encoders.product[LastEvent], TTLConfig.NONE)
      initArmed()
    }

    private def bucketOf(gapS: Long): Long =
      if (gapS <= 0L) 0L else 63L - java.lang.Long.numberOfLeadingZeros(gapS)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[GapOut] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val out = Seq.newBuilder[GapOut]
      var cur = if (last.exists()) Some(last.get()) else None
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur.foreach { p =>
          val g = math.max(0L, (t - p.ms) / 1000L)
          out += GapOut(userId, e.ts, g, bucketOf(g))
        }
        if (cur.forall(p => p.ms < t || (p.ms == t && p.id < e.event_id)))
          cur = Some(LastEvent(t, e.event_id, e.event_type))
      }
      cur.foreach { c =>
        last.update(c)
        rearmTimer(c.ms + idleMs)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[GapOut] = {
      // stale-timer guard: clear only when the CURRENT state really is
      // past its idle horizon at this expiry
      if (last.exists() && last.get().ms + idleMs <= info.getExpiryTimeInMs()) {
        last.clear(); clearArmed()
      }
      Iterator.empty
    }
  }

  /** The full `session_gap_dist` twin IN ONE STREAMING QUERY — gap
    * emission AND the bucket histogram, no read-side fold: the
    * [[GapDistProcessor]] runs under `transformWithState` with `ts`
    * declared as the output's event-time column, which is exactly what
    * Spark's multi-stateful-operator support requires to admit the
    * downstream `groupBy(bucket)` aggregation (the fMGWS-based
    * [[sessionGapsStream]] documents why v1 cannot do this). The agg
    * state is the ≤ ~40-key bucket grid — bounded without a watermark,
    * map-side combinable like the batch plan; `share_mille` stays a
    * read-time projection over the final tiny frame (a SECOND global
    * agg in-query is still unsupported, and the counts are
    * associative anyway). Requires the RocksDB state store provider
    * (a state-API-v2 constraint; StreamingSpec sets it for the
    * query's lifetime). Same late-row divergence contract as the v1
    * twin. */
  def sessionGapDistStream(events: Dataset[Event],
      idleMs: Long = 2L * 60 * 60 * 1000,
      watermark: String = "2 hours"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new GapDistProcessor(idleMs), "ts", OutputMode.Append())
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap_s")).as("sum_gap_s"))
  }

  /** The `session_gap_dist` rollup over [[sessionGapsStream]] output —
    * batch-side by design (see that method's contract note): apply per
    * micro-batch inside `foreachBatch` (merging counts into the sink
    * by bucket — the counts are associative, so per-batch upsert
    * accumulates to the batch query's numbers) or over any collected
    * slice. Emits the batch query's full shape, share_mille included
    * (the cross-bucket total is affordable here — the frame is ≤ ~40
    * rows by construction). */
  def gapHistogram(gaps: DataFrame): DataFrame = {
    val agg = gaps.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap_s")).as("sum_gap_s"))
    val tot = agg.agg(sum(col("n_gaps")).as("tot"))
    agg.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_gaps"), col("sum_gap_s"),
        expr("n_gaps * 1000 div tot").as("share_mille"))
  }

  final case class SessionState(startMs: Long, lastMs: Long, n: Long, total: Double)
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, total_value: Double)

  /** Custom stateful sessionization via `flatMapGroupsWithState` — the
    * escape hatch for state logic `session_window` cannot express
    * (custom counters, conditional emission, cross-session features).
    *
    * A session closes either when a later event for the same user
    * arrives more than `gapMs` after the previous one (emitted
    * immediately) or when the event-time watermark passes
    * `last + gapMs` (timeout path — this is what bounds state). */
  def sessionizeStateful(events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000,
      watermark: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    // epoch MILLIseconds (Timestamp.getTime) — field names say so
    def ms(t: java.sql.Timestamp): Long = t.getTime

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.startMs, s.lastMs, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => (ms(e.ts), e.event_id))
            val closed = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = ms(e.ts)
              cur match {
                case Some(s) if t - s.lastMs > gapMs =>
                  closed += SessionOut(userId, s.startMs, s.lastMs, s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) =>
                  // min/max, not overwrite: a late-but-in-watermark
                  // event from a previous micro-batch may precede the
                  // session's current bounds — never regress them
                  cur = Some(SessionState(math.min(s.startMs, t),
                    math.max(s.lastMs, t), s.n + 1, s.total + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** State-API-v2 processor behind [[sessionizeStream]] — the SAME
    * per-user session fold as [[sessionizeStateful]] (inline close on
    * gap, min/max bound merge for late-but-in-watermark rows), with the
    * v1 single-slot `setTimeoutTimestamp` replaced by an explicit
    * event-time timer at `lastMs + gapMs` under [[TimerHygiene]] (the
    * superseded timer is deleted on every re-arm). The expiry handler
    * EMITS the open session — unlike the transition/gap processors,
    * sessionize's timeout path carries payload, so this pins the v2
    * semantics the others don't: timer-driven OUTPUT, not just
    * eviction — and re-checks the CURRENT state's horizon first, so a
    * stale timer cannot flush a session its user has since extended. */
  private class SessionizeProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, SessionOut] with TimerHygiene {
    @transient private var sess: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sess = getHandle.getValueState[SessionState]("sess",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)
      initArmed()
    }

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val closed = Seq.newBuilder[SessionOut]
      var cur = if (sess.exists()) Some(sess.get()) else None
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastMs > gapMs =>
            closed += SessionOut(userId, s.startMs, s.lastMs, s.n, s.total)
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(s) =>
            // min/max, not overwrite — the v1 late-row rule verbatim
            cur = Some(SessionState(math.min(s.startMs, t),
              math.max(s.lastMs, t), s.n + 1, s.total + e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        sess.update(s)
        rearmTimer(s.lastMs + gapMs)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (sess.exists()) {
        val s = sess.get()
        if (s.lastMs + gapMs <= info.getExpiryTimeInMs()) {
          sess.clear(); clearArmed()
          return Iterator.single(SessionOut(userId, s.startMs, s.lastMs, s.n, s.total))
        }
      }
      Iterator.empty
    }
  }

  /** State-API-v2 twin of [[sessionizeStateful]] — the flagship
    * sessionization fold under `transformWithState` (RocksDB state
    * store, explicit timers) instead of `flatMapGroupsWithState`.
    * Row-for-row the same output as the v1 twin by construction: same
    * inline gap-close, same min/max late-row merge, and the timeout
    * emission rides a stale-guarded event-time timer instead of the v1
    * timeout slot. StreamingSpec pins the v2 rows bit-equal to v1 over
    * the same micro-batches and the RocksDB checkpoint-restart
    * exactly-once contract. Scale posture is v1's: ONE SessionState +
    * one pending timer per active user, hash-partitioned on user_id,
    * watermark-bounded. */
  def sessionizeStream(events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000,
      watermark: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionizeProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Per-user funnel state: min event-time (ms) per step, MaxValue =
    * unseen; `lastMs` is the max event time seen (the inactivity
    * clock). */
  final case class FunnelState(clickMs: Long, viewMs: Long,
      purchaseMs: Long, lastMs: Long)
  final case class FunnelOut(user_id: Long, step: Int,
      click_ms: Option[Long], view_ms: Option[Long], purchase_ms: Option[Long])

  /** Stateful funnel — the streaming twin of the batch `funnel_steps`
    * query. Batch semantics, reproduced exactly: per user, the step
    * reached is computed from the MIN timestamp of each event type
    * (step 1 = any click; step 2 = min view strictly after min click;
    * step 3 = step 2 and min purchase strictly after min view — a view
    * that precedes every click kills step 2 even if later views
    * follow, exactly like the batch conditional-min aggregation).
    *
    * State is three min-timestamps + an inactivity clock per user —
    * O(1) per key, hash-partitioned on user_id — and min is a
    * monotone merge, so late-but-in-watermark events fold in
    * order-independently. A user's funnel row is emitted ONCE, when
    * the event-time watermark passes `lastMs + idleMs` (the funnel
    * report on inactivity; the batch twin reports at corpus end).
    * The same timeout-arming guard as [[attributeStateful]]: a user
    * whose idle horizon the watermark already passed emits inline
    * instead of arming an un-armable timeout. Divergence by
    * construction: an event arriving after its user's report emitted
    * starts a NEW funnel (the old state is gone) — the cost of
    * bounded state on an unbounded stream.
    *
    * Downstream `groupBy(step).count()` (or a conditional sum) gives
    * the batch query's step counts; StreamingSpec pins the per-user
    * agreement and restart exactly-once. */
  def funnelStateful(events: Dataset[Event],
      idleMs: Long = 2L * 3600 * 1000,
      watermark: String = "2 hours"): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    def ms(t: java.sql.Timestamp): Long = t.getTime
    val Unseen = Long.MaxValue
    def emit(userId: Long, s: FunnelState): FunnelOut = {
      val step1 = s.clickMs != Unseen
      val step2 = step1 && s.viewMs != Unseen && s.viewMs > s.clickMs
      val step3 = step2 && s.purchaseMs != Unseen && s.purchaseMs > s.viewMs
      val step = if (step3) 3 else if (step2) 2 else if (step1) 1 else 0
      def opt(v: Long) = if (v == Unseen) None else Some(v)
      FunnelOut(userId, step, opt(s.clickMs), opt(s.viewMs), opt(s.purchaseMs))
    }

    events
      .filter(e => e.event_type == "click" || e.event_type == "view" ||
        e.event_type == "purchase")
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(userId, s))
          } else {
            var s = state.getOption
              .getOrElse(FunnelState(Unseen, Unseen, Unseen, Long.MinValue))
            rows.foreach { e =>
              val t = ms(e.ts)
              s = e.event_type match {
                case "click"    => s.copy(clickMs = math.min(s.clickMs, t))
                case "view"     => s.copy(viewMs = math.min(s.viewMs, t))
                case _          => s.copy(purchaseMs = math.min(s.purchaseMs, t))
              }
              s = s.copy(lastMs = math.max(s.lastMs, t))
            }
            if (s.lastMs + idleMs > state.getCurrentWatermarkMs()) {
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + idleMs)
              Iterator.empty
            } else {
              // idle horizon already behind the watermark — the
              // timeout could never arm; report inline
              state.remove()
              Iterator.single(emit(userId, s))
            }
          }
      }
  }

  /** State-API-v2 processor behind [[funnelStream]] — the same
    * conditional-min funnel fold as [[funnelStateful]] with the v1
    * timeout slot replaced by a [[TimerHygiene]]-managed event-time
    * timer. Like [[SessionizeProcessor]], the expiry handler EMITS
    * (the funnel report is timeout-driven payload, not mere eviction)
    * and re-checks the CURRENT state's idle horizon first, so a stale
    * timer cannot report a funnel its user has since advanced. The v1
    * path's "horizon already behind the watermark → report inline"
    * special case disappears: v2 timers may be registered in the past
    * and simply fire on the next micro-batch — same rows, one less
    * code path. */
  private class FunnelProcessor(idleMs: Long)
      extends StatefulProcessor[Long, Event, FunnelOut] with TimerHygiene {
    @transient private var st: ValueState[FunnelState] = _
    private val Unseen = Long.MaxValue

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[FunnelState]("funnel",
        org.apache.spark.sql.Encoders.product[FunnelState], TTLConfig.NONE)
      initArmed()
    }

    private def report(userId: Long, s: FunnelState): FunnelOut = {
      val step1 = s.clickMs != Unseen
      val step2 = step1 && s.viewMs != Unseen && s.viewMs > s.clickMs
      val step3 = step2 && s.purchaseMs != Unseen && s.purchaseMs > s.viewMs
      val step = if (step3) 3 else if (step2) 2 else if (step1) 1 else 0
      def opt(v: Long) = if (v == Unseen) None else Some(v)
      FunnelOut(userId, step, opt(s.clickMs), opt(s.viewMs), opt(s.purchaseMs))
    }

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[FunnelOut] = {
      var s = if (st.exists()) st.get()
        else FunnelState(Unseen, Unseen, Unseen, Long.MinValue)
      rows.foreach { e =>
        val t = e.ts.getTime
        s = e.event_type match {
          case "click" => s.copy(clickMs = math.min(s.clickMs, t))
          case "view" => s.copy(viewMs = math.min(s.viewMs, t))
          case _ => s.copy(purchaseMs = math.min(s.purchaseMs, t))
        }
        s = s.copy(lastMs = math.max(s.lastMs, t))
      }
      st.update(s)
      rearmTimer(s.lastMs + idleMs)
      Iterator.empty
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[FunnelOut] = {
      if (st.exists()) {
        val s = st.get()
        if (s.lastMs + idleMs <= info.getExpiryTimeInMs()) {
          st.clear(); clearArmed()
          return Iterator.single(report(userId, s))
        }
      }
      Iterator.empty
    }
  }

  /** State-API-v2 twin of [[funnelStateful]] (`transformWithState`,
    * RocksDB, explicit stale-guarded timers) — with [[sessionizeStream]]
    * this closes the v2 ports of both timer-EMITTING stateful
    * operators; StreamingSpec pins it row-equal to the v1 twin
    * including the timer-driven report path. Scale posture is v1's:
    * three min-timestamps + an idle clock + one pending timer per
    * active user, hash-partitioned on user_id, watermark-bounded. */
  def funnelStream(events: Dataset[Event],
      idleMs: Long = 2L * 3600 * 1000,
      watermark: String = "2 hours"): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "click" || e.event_type == "view" ||
        e.event_type == "purchase")
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(idleMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  final case class HeavyUser(event_type: String, user_id: String, est: Long, n: Long)
  final case class HhState(entries: List[(String, Long)], n: Long)

  /** Streaming heavy-hitter monitoring per event type — the streaming
    * twin of the batch [[graft.operators.HeavyHitters]] CANDIDATE pass
    * (the batch operator's exact-verify second scan has no streaming
    * analog; candidates-with-overcount is the honest streaming
    * contract). State per group is a Space-Saving summary serialized
    * as its (key, estimate) list plus the true processed count; each
    * micro-batch reseeds the summary via the weighted offer (the
    * standard SS merge direction — estimates only ever over-count, so
    * presence of true heavies survives checkpoint round-trips). Emits
    * the current candidates each batch: users whose estimate clears
    * perMille/1000 of the type's stream so far. O(capacity) state
    * where exact per-user counting state is unbounded; the pigeonhole
    * presence guarantee (share > 1/capacity ⇒ present) and the
    * overcount bound (est ≤ true + n/capacity ⇒ sub-threshold users
    * with margin stay absent) are pinned in StreamingSpec. */
  def heavyHittersStream(events: Dataset[Event], capacity: Int = 64,
      perMille: Long = 100): Dataset[HeavyUser] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[HhState, HeavyUser](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (tpe: String, rows: Iterator[Event], state: GroupState[HhState]) =>
          val prev = state.getOption.getOrElse(HhState(Nil, 0L))
          val ss = new graft.operators.HeavyHitters.SpaceSaving(capacity)
          prev.entries.foreach { case (k, c) => ss.offerWeighted(k, c) }
          var n = prev.n
          rows.foreach { e => ss.offer(e.user_id.toString); n += 1 }
          state.update(HhState(ss.entries.toList.sorted, n))
          val total = n
          ss.entries.collect {
            case (u, est) if 1000L * est >= perMille * total =>
              HeavyUser(tpe, u, est, total)
          }.toList.sortBy(_.user_id).iterator
      }
  }

  /** State-API-v2 processor behind [[heavyHittersStreamV2]] — the same
    * Space-Saving reseed-and-offer fold as the v1 twin, with the
    * summary held in a MAPSTATE (user → estimate entries) plus a
    * ValueState row counter: the v2 port that pins the MapState
    * primitive (clear / updateValue / iterator round-trips through
    * RocksDB) — the ValueState-only ports can't reach it. Reseeding
    * sorts the read-back entries first, exactly the v1 twin's sorted
    * serialization, so tie-breaking in the weighted offer cannot
    * depend on RocksDB iteration order. */
  private class HeavyHittersProcessor(capacity: Int, perMille: Long)
      extends StatefulProcessor[String, Event, HeavyUser] {
    @transient private var entries: org.apache.spark.sql.streaming.MapState[String, Long] = _
    @transient private var nState: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      entries = getHandle.getMapState[String, Long]("ss",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      nState = getHandle.getValueState[Long]("n",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(tpe: String, rows: Iterator[Event],
        tv: TimerValues): Iterator[HeavyUser] = {
      val ss = new graft.operators.HeavyHitters.SpaceSaving(capacity)
      val prev = entries.iterator().map(p => (p._1, p._2)).toList.sorted
      prev.foreach { case (k, c) => ss.offerWeighted(k, c) }
      var n = if (nState.exists()) nState.get() else 0L
      rows.foreach { e => ss.offer(e.user_id.toString); n += 1 }
      entries.clear()
      ss.entries.foreach { case (k, c) => entries.updateValue(k, c) }
      nState.update(n)
      val total = n
      ss.entries.collect {
        case (u, est) if 1000L * est >= perMille * total =>
          HeavyUser(tpe, u, est, total)
      }.toList.sortBy(_.user_id).iterator
    }
  }

  /** State-API-v2 twin of [[heavyHittersStream]] (`transformWithState`,
    * RocksDB, MapState + ValueState, TimeMode.None — like the Bloom
    * twin the sketch never evicts). StreamingSpec pins it row-equal to
    * the v1 twin across batches and exactly-once across a RocksDB
    * checkpoint restart. Scale posture is v1's: O(capacity) entries
    * per event type, where exact per-user counting is unbounded. */
  def heavyHittersStreamV2(events: Dataset[Event], capacity: Int = 64,
      perMille: Long = 100): Dataset[HeavyUser] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new HeavyHittersProcessor(capacity, perMille),
        TimeMode.None(), OutputMode.Update())
  }

  final case class DistinctEst(event_type: String, n_est: Long, sketch_size: Int)

  /** Streaming distinct-user cardinality per event type — the
    * streaming twin of the batch `distinct_kmv` query, running the
    * SAME sketch ([[graft.operators.Aggregators.Kmv]] reduce over the
    * same [[graft.functions.TextFunctions.portableHashJvm]] hashes),
    * so a stream restarted from a checkpoint and the batch query over
    * the same events land on the IDENTICAL sketch. This is the point
    * of mergeable summaries in streaming: the state is the bounded
    * k-smallest-distinct-hash list (O(k) per group, no timeout — a
    * cardinality never expires), which unbounded countDistinct state
    * could never be. Emits the running estimate per group per
    * micro-batch (Update mode): exact below k, (k-1)·2^60 / kth-min
    * past it — the same libm-free estimator the batch oracle checks. */
  def distinctSketchStream(events: Dataset[Event], k: Int = 64): Dataset[DistinctEst] = {
    import events.sparkSession.implicits._
    val sketch = new graft.operators.Aggregators.Kmv(k)
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[List[Long], DistinctEst](GroupStateTimeout.NoTimeout()) {
        (eventType: String, rows: Iterator[Event], state: GroupState[List[Long]]) =>
          val s = rows.foldLeft(state.getOption.getOrElse(sketch.zero)) { (b, e) =>
            sketch.reduce(b,
              graft.functions.TextFunctions.portableHashJvm(e.user_id.toString, 71))
          }
          state.update(s)
          DistinctEst(eventType,
            graft.operators.Aggregators.kmvEstimateJvm(s, k), s.size)
      }
  }

  final case class Doc(doc_id: Long, text: String)
  final case class BloomFlag(doc_id: Long, fp: Long, dup_suspect: Boolean)

  /** Streaming CONSTANT-MEMORY dedup — the streaming face of the batch
    * `dedup_bloom_probe` front-end, and the bounded-state alternative
    * to exact [[org.apache.spark.sql.Dataset.dropDuplicatesWithinWatermark]]:
    * that operator keeps every key within the watermark horizon
    * (unbounded per horizon, exact); this one keeps a FIXED
    * `groups × bitsPerGroup` bit budget FOREVER — it never needs
    * eviction, at the price of false POSITIVES that grow with fill
    * (never false negatives: an exact duplicate always lands on set
    * bits). The honest production pairing: Bloom flags route to an
    * exact fingerprint check, exactly as the batch query's hits do.
    *
    * Sharding: the content fingerprint routes to `fp mod groups`, so
    * the filter distributes across executors as `groups` independent
    * mini-Blooms (standard partitioned Bloom) instead of one
    * driver-sized bitmap; a duplicate always routes to the same group,
    * preserving the no-false-negative guarantee. Within a micro-batch
    * rows fold in doc_id order, so an intra-batch duplicate is flagged
    * deterministically (the lower id inserts, the higher id hits). */
  def bloomDedupStream(docs: Dataset[Doc], bitsPerGroup: Int = 8192,
      groups: Int = 256, k: Int = 4): Dataset[BloomFlag] = {
    import docs.sparkSession.implicits._
    require(Integer.bitCount(bitsPerGroup) == 1 && bitsPerGroup >= 64,
      s"bitsPerGroup must be a power of two >= 64: $bitsPerGroup")
    docs
      .map(d => (d.doc_id, graft.functions.TextFunctions.portableHashJvm(d.text, 31)))
      .groupByKey { case (_, fp) => (fp % groups).toInt }
      .flatMapGroupsWithState[Array[Byte], BloomFlag](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (g: Int, rows: Iterator[(Long, Long)], state: GroupState[Array[Byte]]) =>
          val bm = state.getOption.map(_.clone())
            .getOrElse(new Array[Byte](bitsPerGroup / 8))
          val out = bloomFoldGroup(bm, rows, bitsPerGroup, k)
          state.update(bm)
          out.iterator
      }
  }

  /** One group's micro-batch Bloom fold, shared VERBATIM by the v1 and
    * v2 twins so their bit positions, intra-batch ordering and flags
    * cannot drift: rows fold in doc_id order (deterministic intra-batch
    * dup flagging), each fingerprint probes k positions, duplicates =
    * all probed bits already set. Mutates `bm` in place. */
  private def bloomFoldGroup(bm: Array[Byte], rows: Iterator[(Long, Long)],
      bitsPerGroup: Int, k: Int): Seq[BloomFlag] =
    rows.toSeq.sortBy(_._1).map { case (id, fp) =>
      val pos = (0 until k).map(i =>
        (graft.functions.TextFunctions.portableHashJvm(fp.toString, 131 + i)
          % bitsPerGroup).toInt)
      val dup = pos.forall(p => (bm(p >> 3) & (1 << (p & 7))) != 0)
      pos.foreach(p => bm(p >> 3) = (bm(p >> 3) | (1 << (p & 7))).toByte)
      BloomFlag(id, fp, dup)
    }

  /** State-API-v2 processor behind [[bloomDedupStreamV2]] — the same
    * per-group bitmap fold as the v1 twin ([[bloomFoldGroup]]); the
    * state is the raw bitmap under the BINARY encoder, no timers
    * (the filter never evicts — that is its contract). */
  private class BloomDedupProcessor(bitsPerGroup: Int, k: Int)
      extends StatefulProcessor[Int, (Long, Long), BloomFlag] {
    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("bloom",
        org.apache.spark.sql.Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(g: Int, rows: Iterator[(Long, Long)],
        tv: TimerValues): Iterator[BloomFlag] = {
      val bm = if (st.exists()) st.get().clone()
        else new Array[Byte](bitsPerGroup / 8)
      val out = bloomFoldGroup(bm, rows, bitsPerGroup, k)
      st.update(bm)
      out.iterator
    }
  }

  /** State-API-v2 twin of [[bloomDedupStream]] (`transformWithState`,
    * RocksDB) — the constant-memory streaming dedup on the forward
    * state API: with sessionize/funnel/gap-dist/transitions this pins
    * the TIMERLESS ValueState path (TimeMode.None — the filter's state
    * is permanent by design, so there is no watermark, no TTL and no
    * timer to manage). StreamingSpec pins it row-equal to the v1 twin
    * and exactly-once across a RocksDB checkpoint restart. Scale
    * posture is v1's: `groups` independent mini-Blooms, fixed
    * `groups × bitsPerGroup` bits forever, no false negatives. */
  def bloomDedupStreamV2(docs: Dataset[Doc], bitsPerGroup: Int = 8192,
      groups: Int = 256, k: Int = 4): Dataset[BloomFlag] = {
    import docs.sparkSession.implicits._
    require(Integer.bitCount(bitsPerGroup) == 1 && bitsPerGroup >= 64,
      s"bitsPerGroup must be a power of two >= 64: $bitsPerGroup")
    docs
      .map(d => (d.doc_id, graft.functions.TextFunctions.portableHashJvm(d.text, 31)))
      .groupByKey { case (_, fp) => (fp % groups).toInt }
      .transformWithState(new BloomDedupProcessor(bitsPerGroup, k),
        TimeMode.None(), OutputMode.Update())
  }

  final case class CmEst(event_type: String, user_id: Long, cm_est: Long, n: Long)

  /** Streaming Count-Min frequency monitoring per event type — the
    * streaming twin of the batch `freq_cm_sketch` query, running the
    * SAME d×w counter grid over the same
    * [[graft.functions.TextFunctions.portableHashJvm]] hashes, so the
    * state after any prefix of the stream IS the batch sketch over that
    * prefix (counters just add — the mergeability the batch query's
    * Scaladoc claims, exercised live here). State per group is the flat
    * d·w counter vector plus the processed count: O(d·w) fixed,
    * where exact per-key counting state is unbounded. Each micro-batch
    * emits the running estimate for the caller's probe keys (Update
    * mode): never below the key's true count, over by at most the
    * colliding mass (StreamingSpec pins both against an independently
    * folded reference grid). */
  def cmSketchStream(events: Dataset[Event], probes: Seq[Long],
      d: Int = 4, w: Int = 256): Dataset[CmEst] = {
    import events.sparkSession.implicits._
    def bucket(key: String, row: Int): Int =
      (graft.functions.TextFunctions.portableHashJvm(key, row) % w).toInt
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[(Long, Array[Long]), CmEst](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (tpe: String, rows: Iterator[Event], state: GroupState[(Long, Array[Long])]) =>
          val (n0, cells0) = state.getOption.getOrElse((0L, new Array[Long](d * w)))
          val cells = cells0.clone()
          var n = n0
          rows.foreach { e =>
            n += 1
            var i = 0
            while (i < d) { cells(i * w + bucket(e.user_id.toString, i)) += 1; i += 1 }
          }
          state.update((n, cells))
          probes.iterator.map { uid =>
            val est = (0 until d)
              .map(i => cells(i * w + bucket(uid.toString, i))).min
            CmEst(tpe, uid, est, n)
          }
      }
  }

  final case class QuantileEst(event_type: String, n: Long,
      p50_cents: Long, p95_cents: Long, sample_size: Int)

  /** Streaming quantile monitoring per event type — the streaming twin
    * of the batch `quantile_sketch` (ProfilingQueries): state is the
    * deterministic bottom-k-by-hash uniform sample of event VALUES
    * ([[graft.operators.Aggregators.StableSample]]'s reduce — O(k) per
    * group, order-insensitive, so micro-batch arrival order and
    * checkpoint restarts land on the identical sample a batch run
    * computes over the same events), plus the true processed count.
    * Emits the running p50/p95 of value-cents per group per
    * micro-batch (Update mode), read at the same exact-integer ceil
    * positions as the batch form — (n·q + 99) div 100, no float
    * boundary. Quantile state that is NOT a bounded sketch (exact
    * order statistics) would be unbounded per group. */
  def quantileSketchStream(events: Dataset[Event], k: Int = 256): Dataset[QuantileEst] = {
    import events.sparkSession.implicits._
    val sampler = new graft.operators.Aggregators.StableSample(k)
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[(Long, List[(Long, Long)]), QuantileEst](
        GroupStateTimeout.NoTimeout()) {
        (eventType: String, rows: Iterator[Event],
            state: GroupState[(Long, List[(Long, Long)])]) =>
          var (n, buf) = state.getOption.getOrElse((0L, sampler.zero))
          rows.foreach { e =>
            n += 1
            buf = sampler.reduce(buf, (
              graft.functions.TextFunctions.portableHashJvm(e.event_id.toString, 71),
              math.floor(e.value * 100.0 + 0.5).toLong)) // QueryDef.cents, JVM form
          }
          state.update((n, buf))
          val sv = buf.map(_._2).sorted.toIndexedSeq
          def pos(q: Int): Long = sv(((sv.size * q + 99) / 100 - 1).max(0))
          QuantileEst(eventType, n, pos(50), pos(95), sv.size)
      }
  }

  final case class PsiEst(event_type: String, n_base: Long, n_cur: Long,
      psi_micro: Long, drifted: Long)

  /** Streaming POPULATION STABILITY INDEX per event type — the twin of
    * the batch `drift_psi` (EventQueries): state is the 2×24
    * hour-of-day count grid (baseline = event days in [d0Day,
    * d0Day+15), current = the rest — same split as the batch anchor),
    * a fixed 48 longs per type, and each micro-batch emits the running
    * PSI in micro-nats with the batch form's EXACT integer arithmetic:
    * add-one-smoothed cross products pn/qn in BigInt (the JVM twin of
    * the batch decimal(38,0) — a Long product wraps past ~3e9-count
    * grids), ln of their double ratio rounded once to micro-nats, the
    * Σ(pn−qn)·t term and the final floor division in BigInt too. Every term of the sum is ≥ 0, so
    * truncating and floor division agree — the same argument the
    * batch/DuckDB pair relies on; the final emission over the same
    * events therefore equals the batch rows bit for bit, and
    * StreamingSpec asserts exactly that plus checkpoint-restart
    * consistency (state is a pure fold, so batching cannot move it).
    *
    * `d0Day` (epoch days) is supplied by the caller, as
    * [[rateAnomalyStream]] takes its baseline frame: a stream cannot
    * know the corpus-wide min day until it has seen all data — the
    * deployment contract is "anchor the monitoring window when you
    * arm the monitor". Day/hour come from floorDiv on epoch millis,
    * which equals the batch's micro-level floor by nested-floor-
    * division identity. */
  def psiDriftStream(events: Dataset[Event], d0Day: Long): Dataset[PsiEst] = {
    import events.sparkSession.implicits._
    val B = 24
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[Array[Long], PsiEst](GroupStateTimeout.NoTimeout()) {
        (tpe: String, rows: Iterator[Event], state: GroupState[Array[Long]]) =>
          val g = state.getOption.map(_.clone())
            .getOrElse(new Array[Long](2 * B))
          rows.foreach { e =>
            val msEpoch = e.ts.getTime
            val cur = if (Math.floorDiv(msEpoch, 86400000L) >= d0Day + 15) 1 else 0
            val hr = Math.floorMod(Math.floorDiv(msEpoch, 3600000L), 24L).toInt
            g(cur * B + hr) += 1
          }
          state.update(g)
          var n0 = 0L; var n1 = 0L
          var i = 0
          while (i < B) { n0 += g(i); n1 += g(B + i); i += 1 }
          var sm = BigInt(0)
          i = 0
          while (i < B) {
            // BigInt cross products — the JVM twin of the batch
            // query's DECIMAL(38,0): a Long (count+1)·(total+24) wraps
            // past ~3e9-count grids, silently
            val pn = BigInt(g(B + i) + 1L) * (n0 + B)
            val qn = BigInt(g(i) + 1L) * (n1 + B)
            val t = math.floor(math.log(pn.toDouble / qn.toDouble) * 1e6 + 0.5).toLong
            sm += (pn - qn) * BigInt(t)
            i += 1
          }
          val psi = (sm / (BigInt(n1 + B) * BigInt(n0 + B))).toLong
          PsiEst(tpe, n0, n1, psi, if (psi > 200000L) 1L else 0L)
      }
  }

  final case class DocMeta(doc_id: Long, lang: String, n_chars: Long)
  final case class WeightedSampleOut(lang: String, n_seen: Long,
      doc_id: Long, w: Long, pr_micro: Long, rk: Long)

  /** Streaming WEIGHTED SAMPLE — the twin of the batch
    * `weighted_sample` (CurationQueries.prioritySample,
    * Duffield–Lund–Thorup priority sampling): per language stratum the
    * state is the k highest-priority documents seen so far — a BOUNDED
    * k-entry list, the reservoir that makes weighted sampling a
    * one-pass streaming operator at all. The fold is a top-k set merge
    * under the batch query's exact total order (priority DESC, doc_id
    * ASC), which is associative, commutative and idempotent per
    * doc_id (at-least-once redelivery cannot double-insert), so
    * batching cannot move the final emission. Priority arithmetic is
    * the batch column's JVM twin: u = floorMod(portableHash(id, 37),
    * 2^30) + 1, ONE ieee division n_chars/u of two
    * exactly-representable integers, micro-rounded once — the final
    * emission equals the batch rows bit for bit (StreamingSpec
    * asserts it under an arbitrary split). `n_seen` counts processed
    * rows per stratum so a reader can pick each stratum's latest
    * emission out of an update-mode sink. */
  def weightedSampleStream(docs: Dataset[DocMeta], k: Int = 8)
      : Dataset[WeightedSampleOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.lang)
      .flatMapGroupsWithState[(Long, List[(Long, Long, Double)]), WeightedSampleOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (lang, rows, state) =>
          var (n, top) = state.getOption.getOrElse((0L, Nil))
          rows.foreach { d =>
            n += 1
            val u = java.lang.Math.floorMod(
              graft.functions.TextFunctions.portableHashJvm(
                d.doc_id.toString, 37), 1073741824L) + 1L
            val p = d.n_chars.toDouble / u.toDouble
            top = ((d.doc_id, d.n_chars, p) ::
              top.filterNot(_._1 == d.doc_id))
              .sortBy(t => (-t._3, t._1)).take(k)
          }
          state.update((n, top))
          top.zipWithIndex.iterator.map { case ((id, w, p), i) =>
            WeightedSampleOut(lang, n, id, w,
              math.floor(p * 1e6 + 0.5).toLong, (i + 1).toLong)
          }
      }
  }

  final case class HllEst(event_type: String, n_seen: Long, n_est: Long)

  /** Streaming HYPERLOGLOG distinct-user estimate per event type — the
    * twin of the batch `distinct_hll` (ProfilingQueries): state is the
    * 64-register max-rank grid (a fixed 64 longs per type — registers
    * merge by MAX, so the fold is order-insensitive and a checkpoint
    * restart cannot move it), plus the raw processed count. Each
    * micro-batch emits the running estimate with the batch form's
    * EXACT integer arithmetic: rho from Long.numberOfLeadingZeros (the
    * JVM twin of the engines' length(bin(w)) integer log₂), the
    * harmonic sum held exactly as S = Σ 2^(55−Mj) over denominator
    * 2^55, n_raw = α-numerator div (S·10^6) in BigInt (the JVM twin of
    * the batch DECIMAL(38,0)), and the linear-counting branch below
    * 2.5m with the same once-rounded micro-nat ln — so the final
    * emission over the same events equals the batch rows bit for bit
    * (StreamingSpec asserts exactly that). */
  def hllDistinctStream(events: Dataset[Event]): Dataset[HllEst] = {
    import events.sparkSession.implicits._
    val AlphaNum = BigInt("104680255103913656422760448")
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[(Long, Array[Long]), HllEst](GroupStateTimeout.NoTimeout()) {
        (tpe: String, rows: Iterator[Event], state: GroupState[(Long, Array[Long])]) =>
          val (n0, regs0) = state.getOption match {
            case Some((n, r)) => (n, r.clone())
            case None => (0L, new Array[Long](64))
          }
          var n = n0
          rows.foreach { e =>
            n += 1
            val h = graft.functions.TextFunctions
              .portableHashJvm(e.user_id.toString, 83)
            val j = (h % 64).toInt
            val w = h / 64
            val rho =
              if (w == 0L) 55L
              else 55L - (64 - java.lang.Long.numberOfLeadingZeros(w))
            if (rho > regs0(j)) regs0(j) = rho
          }
          state.update((n, regs0))
          var s = BigInt(0); var v = 0L
          var i = 0
          while (i < 64) {
            if (regs0(i) == 0L) v += 1
            s += BigInt(1) << (55 - regs0(i).toInt)
            i += 1
          }
          val nRaw = (AlphaNum / (s * 1000000)).toLong
          val nEst =
            if (v > 0 && nRaw <= 160L) {
              val tMicro = math.floor(math.log(64.0 / v) * 1e6 + 0.5).toLong
              (64L * tMicro) / 1000000L
            } else nRaw
          HllEst(tpe, n, nEst)
      }
  }
}
