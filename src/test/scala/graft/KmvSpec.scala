package graft

import graft.operators.Aggregators
import graft.operators.Aggregators.Kmv
import org.apache.spark.sql.functions._

/** Pins the KMV distinct-count sketch: the buffer invariants that make
  * it a lawful mergeable summary (sorted, distinct, bounded), the
  * partition-independence determinism the estimator's exactness
  * contract relies on, and the accuracy of the (k-1)·2^60 / kth-min
  * estimate against ground truth.
  */
class KmvSpec extends SparkSuite {

  private val TwoPow60 = 1152921504606846976.0

  test("Kmv buffer: sorted, distinct, bounded; duplicates are no-ops") {
    val k = new Kmv(8)
    val hashes = Seq(90L, 10L, 50L, 10L, 90L, 30L, 70L, 20L, 60L, 40L, 80L, 30L)
    val buf = hashes.foldLeft(k.zero)(k.reduce)
    assert(buf == buf.distinct.sorted)
    assert(buf.size == 8)
    // the 8 smallest distinct values, regardless of arrival order/dups
    assert(buf == List(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L))
  }

  test("Kmv merge: commutative, agrees with single-stream reduce") {
    val k = new Kmv(4)
    val (l, r) = (Seq(5L, 25L, 15L, 5L), Seq(10L, 20L, 15L, 30L))
    val bl = l.foldLeft(k.zero)(k.reduce)
    val br = r.foldLeft(k.zero)(k.reduce)
    val together = (l ++ r).foldLeft(k.zero)(k.reduce)
    assert(k.merge(bl, br) == together)
    assert(k.merge(br, bl) == together)
  }

  test("sketch is partition-invariant (1 vs 13 partitions, with dups)") {
    import spark.implicits._
    val vals = (1L to 5000L).map(i => i * 2654435761L % 1000003L) ++
      (1L to 1000L).map(i => i * 2654435761L % 1000003L) // repeats
    def sketch(parts: Int): Seq[Long] =
      vals.toDF("h").repartition(parts)
        .agg(Aggregators.kmv(64, col("h")).as("sk"))
        .collect()(0).getSeq[Long](0)
    assert(sketch(1) == sketch(13))
  }

  test("estimate within 25% on 10k distinct; exact below k") {
    import spark.implicits._
    val n = 10000
    val df = (1 to n).map(i => s"user$i").toDF("u")
      .select(graft.functions.TextFunctions.portableHash(col("u"), 71).as("h"))
    val sk = df.agg(Aggregators.kmv(64, col("h"))).collect()(0).getSeq[Long](0)
    assert(sk.size == 64)
    val est = math.floor(63.0 * TwoPow60 / sk(63).toDouble + 0.5)
    assert(math.abs(est - n) / n < 0.25, s"est=$est truth=$n")

    // below k the sketch IS the exact distinct hash set
    val small = (1 to 40).map(i => s"user$i").toDF("u")
      .select(graft.functions.TextFunctions.portableHash(col("u"), 71).as("h"))
    val sk2 = small.agg(Aggregators.kmv(64, col("h"))).collect()(0).getSeq[Long](0)
    assert(sk2.size == 40)
  }

  test("distinct_kmv query: estimates every event_type within 25% at sf0.001") {
    val out = queries.ProfilingQueries.defs.find(_.name == "distinct_kmv").get
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 5)
    out.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      // 15 users < k=64: the sketch is exact here
      assert(est == exact, s"${r.getString(0)}: est=$est exact=$exact")
    }
  }
}
