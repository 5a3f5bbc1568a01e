package graft

import graft.operators.HeavyHitters
import graft.operators.HeavyHitters.SpaceSaving
import org.apache.spark.sql.functions._

/** Pins the heavy-hitters operator: the Space-Saving summary's
  * guarantees (bounded size, over-estimation, presence of locally
  * heavy keys) and the end-to-end exactness the sketch→verify shape
  * promises — candidates may include extras, the verified result must
  * EQUAL the brute-force GROUP BY + threshold.
  */
class HeavyHittersSpec extends SparkSuite {

  test("SpaceSaving: bounded size, estimates only over-count") {
    val ss = new SpaceSaving(4)
    val stream = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      (1 to 40).map(i => s"rare$i") ++ Seq.fill(20)("a")
    stream.foreach(ss.offer)
    val est = ss.entries.toMap
    assert(est.size <= 4)
    assert(ss.n == 140)
    // true heavies survive the noise and never under-count
    assert(est("a") >= 70)
    assert(est("b") >= 30)
  }

  test("SpaceSaving: any key with local share ≥ 1/capacity is present") {
    // the pigeonhole presence guarantee candidate emission relies on:
    // capacity 10 → every key with ≥ n/10 occurrences must be in the
    // summary, whatever the arrival order
    val keys = (1 to 9).flatMap(i => Seq.fill(i * 10)(s"k$i")) // 450 items
    val noise = (1 to 100).map(i => s"noise$i")
    val stream = scala.util.Random.shuffle(keys ++ noise) // any order is fine
    val ss = new SpaceSaving(10)
    stream.foreach(ss.offer)
    val present = ss.entries.map(_._1).toSet
    val n = ss.n
    for ((k, c) <- (keys ++ noise).groupBy(identity).view.mapValues(_.size)
         if c.toLong * ss.capacity >= n)
      assert(present.contains(k), s"$k (count $c of $n) must be present")
  }

  test("SpaceSaving: over-estimation is bounded by n/capacity (the classic SS bound)") {
    // est − true ≤ n/k: an estimate inherits at most the evicted
    // minimum, and the minimum count can never exceed n/k. This is
    // what makes the per-partition emit threshold meaningful — a
    // candidate's estimate is at most n/k above reality.
    val stream = (1 to 2000).map(i => s"k${i % 97}") ++ (1 to 400).map(i => s"one$i")
    val ss = new SpaceSaving(50)
    stream.foreach(ss.offer)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((k, est) <- ss.entries)
      assert(est - truth(k) <= ss.n / ss.capacity,
        s"$k: est $est vs true ${truth(k)} exceeds n/k = ${ss.n / ss.capacity}")
  }

  test("deterministic eviction: identical streams yield identical summaries") {
    val stream = (1 to 500).map(i => s"k${i % 37}") ++ (1 to 100).map(i => s"x$i")
    def run() = { val ss = new SpaceSaving(8); stream.foreach(ss.offer); ss.entries.toList.sorted }
    assert(run() == run())
  }

  test("end-to-end: verified heavy hitters equal the brute-force threshold query") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tk"))
      .as[String]
    val got = HeavyHitters(spark, toks, perMille = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val all = toks.collect()
    val n = all.length.toLong
    val expect = all.groupBy(identity).view.mapValues(_.size.toLong)
      .collect { case (tk, c) if 1000L * c >= n => (tk, c) }.toSet
    assert(got == expect)
    assert(expect.nonEmpty)
    spark.catalog.clearCache() // release the summary persist
  }

  test("a tighter threshold (perMille=5) shrinks the result and stays exact") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tk"))
      .as[String]
    val loose = HeavyHitters(spark, toks, perMille = 1).count()
    val tight = HeavyHitters(spark, toks, perMille = 5, capacity = 400).count()
    assert(tight <= loose)
    spark.catalog.clearCache()
  }

  test("the exact 1000/perMille capacity is rejected — SS presence is strict-inequality") {
    // capacity·perMille == 1000 puts a boundary-share token exactly AT
    // the eviction threshold, where Space-Saving may drop it — the
    // doubled bound is a hard floor, not advice
    import spark.implicits._
    val toks = spark.createDataset(Seq("a", "b"))
    val e = intercept[IllegalArgumentException] {
      HeavyHitters(spark, toks, perMille = 5, capacity = 200)
    }
    assert(e.getMessage.contains("too small"))
  }
}
