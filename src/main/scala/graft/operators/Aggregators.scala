package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{element_at, floor, lit, size, when}

/** Custom typed aggregators (`Aggregator[IN, BUF, OUT]`) — the engine's
  * sketch/custom-aggregation machinery (SURVEY §7 step 9; the reference
  * has no UDAF surface at all, §2.8, so these are pure extensions).
  *
  * Each is algebraic (associative + commutative merge), which is what
  * makes it map-side combinable: Spark runs `reduce` inside each
  * partition and `merge` across partitions — the same contract a
  * 1000-executor shuffle needs.
  */
object Aggregators {

  /** Bounded top-k of (score, tag) pairs per group — a per-group heap
    * that never materializes the group. The scalable alternative to
    * `row_number().over(window)` when k ≪ group size: state is O(k),
    * not O(group), and combines map-side before the shuffle.
    *
    * Ties break toward the smaller tag (deterministic output). */
  final class TopK(k: Int) extends Aggregator[(Double, Long), List[(Double, Long)], Seq[Long]] {
    // buffer invariant: sorted by (-score, tag), length <= k — so the
    // common case in reduce (full buffer, uncompetitive row) is O(1)
    // instead of a sort per input row
    private def worse(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 >= b._2)
    private def trim(l: List[(Double, Long)]): List[(Double, Long)] =
      l.sortBy { case (s, t) => (-s, t) }.take(k)
    def zero: List[(Double, Long)] = Nil
    def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
      if (b.lengthCompare(k) >= 0 && worse(a, b.last)) b else trim(a :: b)
    def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
      trim(b1 ++ b2)
    def finish(r: List[(Double, Long)]): Seq[Long] = r.map(_._2)
    def bufferEncoder: Encoder[List[(Double, Long)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Deterministic reservoir-style sample of up to n tags per group:
    * keeps the n smallest md5-ranks, so the "random" subset is stable
    * across runs, partitionings, and engines (the property a resumable
    * 100 TB pipeline needs from sampling). */
  final class StableSample(n: Int) extends Aggregator[(Long, Long), List[(Long, Long)], Seq[Long]] {
    private def trim(l: List[(Long, Long)]): List[(Long, Long)] = l.sortBy(identity).take(n)
    def zero: List[(Long, Long)] = Nil
    def reduce(b: List[(Long, Long)], a: (Long, Long)): List[(Long, Long)] =
      if (b.lengthCompare(n) >= 0 && Ordering[(Long, Long)].gteq(a, b.last)) b
      else trim(a :: b)
    def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] = trim(a ++ b)
    def finish(r: List[(Long, Long)]): Seq[Long] = r.map(_._2)
    def bufferEncoder: Encoder[List[(Long, Long)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** K-Minimum-Values distinct-count sketch (Bar-Yossef et al.,
    * "Counting distinct elements in a data stream", RANDOM 2002): keep
    * the k smallest DISTINCT hash values seen; with hashes uniform on
    * [0, 2^60) the k-th minimum m yields the estimate
    * (k-1) · 2^60 / m. State is O(k); merge is union-then-retrim —
    * associative, commutative, and idempotent on duplicates — the
    * mergeable-summary contract that lets every executor sketch its
    * partition independently and combine map-side before one tiny
    * shuffle. Unlike HyperLogLog the estimator needs no leading-zero
    * rank (a libm-free formula the DuckDB oracle reproduces
    * bit-for-bit from the same md5-derived hashes), and the sketch is
    * fully deterministic: the k smallest distinct values of a set do
    * not depend on arrival order or partitioning.
    *
    * Buffer invariant: sorted ascending, distinct, length ≤ k — so the
    * common reduce case (full buffer, uncompetitive hash) is O(1). A
    * not-yet-full sketch IS the exact distinct hash set; finishers use
    * its size as the exact count. */
  final class Kmv(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
    private def trim(l: List[Long]): List[Long] = l.distinct.sorted.take(k)
    def zero: List[Long] = Nil
    def reduce(b: List[Long], h: Long): List[Long] =
      if (b.lengthCompare(k) >= 0 && h >= b.last) b
      else if (b.contains(h)) b
      else trim(h :: b)
    def merge(a: List[Long], b: List[Long]): List[Long] = trim(a ++ b)
    def finish(r: List[Long]): Seq[Long] = r
    def bufferEncoder: Encoder[List[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Bloom-filter bitmap builder: aggregates bit POSITIONS (the caller
    * derives k positions per element from a portable hash) into one
    * `numBits`-wide bitmap packed as Array[Long]. reduce sets a bit in
    * place; merge ORs word-wise — associative, commutative, idempotent,
    * so every map task builds its partition's bitmap locally and the
    * shuffle carries one bitmap per task, not one row per element. The
    * finished bitmap is a broadcastable membership summary (numBits/8
    * bytes — 128 KB at 2^20 bits): the classic join-pruning/dedup-probe
    * primitive for "test 10 TB of arrivals against 100 TB of corpus
    * without shuffling the corpus". Deterministic: the final bitmap is
    * the OR of per-element bitmaps, order- and partition-independent. */
  final class BloomBits(numBits: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits % 64 == 0, s"numBits must be a multiple of 64, got $numBits")
    def zero: Array[Long] = new Array[Long](numBits / 64)
    def reduce(b: Array[Long], pos: Long): Array[Long] = {
      b((pos >> 6).toInt) |= 1L << (pos & 63)
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  import org.apache.spark.sql.functions.udaf
  /** Column form of [[TopK]] for untyped DataFrames (a tuple-input
    * aggregator takes its fields as separate argument columns). */
  def topK(k: Int, score: Column, tag: Column): Column =
    udaf(new TopK(k)).apply(score, tag)

  def stableSample(n: Int, rank: Column, tag: Column): Column =
    udaf(new StableSample(n)).apply(rank, tag)

  def kmv(k: Int, hash: Column): Column =
    udaf(new Kmv(k)).apply(hash)

  /** THE KMV closed-form estimator — the single definition every
    * consumer uses (batch queries, set-algebra union sketches, the
    * streaming twin), so a future k or hash-width change cannot
    * desynchronize them. Hashes are uniform on [0, 2^60)
    * ([[graft.functions.TextFunctions.portableHash]]); a sketch of
    * fewer than k values IS the exact distinct hash set and estimates
    * by its size; a full sketch estimates (k−1)·2^60 / kth-min,
    * floor(x + 0.5)-rounded. Deliberately libm-free (one IEEE multiply
    * and divide) so DuckDB reproduces it bit-for-bit — the oracle SQL
    * and specs restate the formula INDEPENDENTLY by design (that
    * restatement is the cross-check; keep them in lockstep with this
    * definition when k or the hash width changes). */
  val KmvHashSpace: Double = 1152921504606846976.0 // 2^60

  /** Column form of the estimator over a finished sketch column
    * (ascending Array/Seq[Long], length ≤ k). */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble) * lit(KmvHashSpace) /
        element_at(sketch, k).cast("double") + lit(0.5)).cast("long"))

  /** JVM form — the streaming state path ([[graft.streaming.EventStreams
    * .distinctSketchStream]]) evaluates per group inside
    * mapGroupsWithState, outside Catalyst. */
  def kmvEstimateJvm(sketch: Seq[Long], k: Int): Long =
    if (sketch.size < k) sketch.size.toLong
    else math.floor((k - 1).toDouble * KmvHashSpace / sketch(k - 1).toDouble + 0.5).toLong

  def bloomBits(numBits: Int, pos: Column): Column =
    udaf(new BloomBits(numBits)).apply(pos)
}
