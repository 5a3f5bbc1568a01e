package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Exact heavy hitters without a full-cardinality shuffle — the
  * sketch→verify pattern (same shape as the LSH dedup stack: cheap
  * candidate discovery, exact verification of candidates only),
  * applied to token frequency.
  *
  * A plain `groupBy(token).count()` heavy-hitter query shuffles one
  * row per DISTINCT (partition, token) pair — at 100 TB of text with
  * billions of distinct tokens the exchange is the job. This operator:
  *
  *  1. candidates: one narrow pass; each input partition keeps a
  *     bounded Space-Saving summary (capacity k) and emits only the
  *     locally-heavy keys plus its item count. NO shuffle of the
  *     token stream, O(k) memory per task.
  *  2. exact verify: a second scan counts ONLY candidate tokens
  *     (semi-join prune before the exchange), then filters by the
  *     global threshold from the summed partition counts. The final
  *     counts are exact — the sketch can only add false candidates,
  *     never lose a true one, and verification removes the false ones.
  *
  * Completeness is a pigeonhole argument, not a probabilistic one:
  * if a token's global share is ≥ f = perMille/1000, then in at least
  * one partition its local share is ≥ f (otherwise the global sum
  * would be < f·N). Space-Saving with capacity k guarantees presence
  * (estimate ≥ true count) only for keys with local count STRICTLY
  * ABOVE n/k — at exactly n/k a key can be evicted — so k must be
  * strictly larger than 1000/perMille for the per-partition emit
  * (1000·est ≥ perMille·n_p) to never drop a truly heavy token.
  * The constructor therefore requires the DOUBLED bound
  * (capacity·perMille ≥ 2000): a boundary-share token then sits at
  * twice the eviction threshold, safely inside the guarantee. All
  * thresholds are integer arithmetic — nothing float-dependent
  * anywhere.
  */
object HeavyHitters {

  /** Bounded frequency summary (Metwally et al.'s Space-Saving).
    * Estimates only ever OVER-count (a replaced key inherits the
    * evicted minimum), which is exactly the direction candidate
    * generation needs. Eviction tie-break is the lexicographically
    * smallest min-count key, so a deterministic input order yields a
    * deterministic summary. O(log k) per offer.
    */
  private[graft] final class SpaceSaving(val capacity: Int) {
    require(capacity > 0, s"capacity=$capacity")
    private val counts = scala.collection.mutable.HashMap.empty[String, Long]
    private val byCount = new java.util.TreeMap[Long, java.util.TreeSet[String]]()
    private var processed = 0L

    /** Items offered so far (the partition's n_p). */
    def n: Long = processed

    private def indexAdd(key: String, c: Long): Unit = {
      val set = byCount.get(c)
      if (set != null) { set.add(key); () }
      else {
        val s = new java.util.TreeSet[String]()
        s.add(key)
        byCount.put(c, s)
        ()
      }
    }

    private def indexRemove(key: String, c: Long): Unit = {
      val set = byCount.get(c)
      set.remove(key)
      if (set.isEmpty) { byCount.remove(c); () }
    }

    def offer(key: String): Unit = offerWeighted(key, 1L)

    /** Weighted offer (the standard Space-Saving generalization:
      * increment by w, evicted keys inherit min + w). `offer` is the
      * w=1 case; streaming state restoration seeds a fresh summary
      * with the checkpointed (key, estimate) pairs through this. */
    def offerWeighted(key: String, w: Long): Unit = {
      require(w > 0, s"w=$w")
      processed += w
      counts.get(key) match {
        case Some(c) =>
          counts.update(key, c + w)
          indexRemove(key, c)
          indexAdd(key, c + w)
        case None if counts.size < capacity =>
          counts.update(key, w)
          indexAdd(key, w)
        case None =>
          val minEntry = byCount.firstEntry()
          val minC = minEntry.getKey
          val victim = minEntry.getValue.first()
          indexRemove(victim, minC)
          counts.remove(victim)
          counts.update(key, minC + w)
          indexAdd(key, minC + w)
      }
    }

    /** (key, estimate) pairs; estimate ≥ true in-partition count. */
    def entries: Iterator[(String, Long)] = counts.iterator
  }

  /** Exact tokens whose global count satisfies
    * `1000·freq ≥ perMille·N` over the given token stream.
    * Output: (tk, freq), exact counts, caller orders.
    *
    * The one-pass summary frame (≤ capacity+1 rows per partition) is
    * persisted — it feeds both the candidate set and the 1-row global
    * total; the caller's clearCache sweep releases it (Bench/Verify
    * contract). The token stream itself is scanned twice (candidates,
    * verify) but NEVER shuffled at full cardinality: the exchange
    * carries candidate tokens only.
    */
  def apply(s: SparkSession, tokens: Dataset[String],
      perMille: Long = 1, capacity: Int = 2000): DataFrame = {
    require(perMille >= 1 && perMille <= 1000, s"perMille=$perMille")
    // doubled pigeonhole bound: SS guarantees presence only STRICTLY
    // above n/capacity, so capacity·perMille == 1000 exactly would let
    // a boundary-share token be evicted — 'exact' would silently lie
    require(capacity * perMille >= 2000L,
      s"capacity=$capacity too small for perMille=$perMille " +
        s"(needs ≥ ${(2000L + perMille - 1) / perMille})") // ceil: int div would suggest a still-rejected value
    import s.implicits._
    val summaries = tokens.mapPartitions { it =>
      val ss = new SpaceSaving(capacity)
      it.foreach(ss.offer)
      val cands = ss.entries.collect {
        case (tk, est) if 1000L * est >= perMille * ss.n => (tk, 0L, false)
      }
      cands ++ Iterator.single(("", ss.n, true))
    }.persist()
    val candidates = summaries.filter(!_._3).map(_._1).toDF("tk").distinct()
    val total = summaries.filter(_._3).map(_._2).toDF("np")
      .agg(sum(col("np")).as("n_total"))
    tokens.toDF("tk")
      .join(candidates, Seq("tk"), "left_semi")
      .groupBy(col("tk"))
      .agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(lit(1000L) * col("freq") >= lit(perMille) * col("n_total"))
      .select(col("tk"), col("freq"))
  }
}
