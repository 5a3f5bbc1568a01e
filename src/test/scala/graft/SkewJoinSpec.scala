package graft

import org.apache.spark.sql.functions._

/** Runtime skew handling: AQE detects an oversized shuffle partition
  * (one hot join key) and splits it across tasks — no code change, no
  * salting. Thresholds are lowered to make a ~25 MB hot key "skewed"
  * at test scale; at cluster scale the defaults (256 MB / 5× median)
  * do the same. Complements the salted-join rewrite (query
  * `join_salted_skew`), which covers aggregation skew and cases AQE
  * can't touch.
  */
class SkewJoinSpec extends SparkSuite {

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot key's shuffle partition (skew=true in plan)") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // 250k of 300k fact rows share key 1 → one partition dwarfs the rest
      val fact = spark.range(0, 300000).select(
        when(col("id") < 250000, 1L).otherwise(col("id") % 500).as("k"),
        lpad(col("id").cast("string"), 100, "0").as("pad"))
      val dim = spark.range(0, 500).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("dv"))
      // execute THIS plan (count() would build its own QueryExecution
      // and leave `joined`'s un-finalized); keep `pad` flowing through
      // the shuffle so the hot partition's bytes actually exceed the
      // skew threshold (a pruned 8-byte key column compresses under it)
      val joined = fact.join(dim, "k").select(col("k"), col("pad"))
      assert(joined.collect().length == 300000)
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("skew=true"), plan)
    }
  }

  test("AQE coalesces undersized shuffle partitions into fewer tasks") {
    // The inverse knob (SCALE.md "narrow scans"): 32 configured shuffle
    // partitions over a few KB of aggregated data would mean 32 nearly
    // empty tasks; AQE's coalescing folds them into a handful sized by
    // the advisory target. At cluster scale this is what keeps
    // small-intermediate stages from drowning in task overhead.
    withConfs(
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m") {
      val agg = spark.range(0, 100000)
        .groupBy((col("id") % 1000).as("k")).agg(count(lit(1)).as("n"))
      val got = agg.collect().length
      assert(got == 1000)
      val plan = agg.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // the adaptive shuffle read reports itself coalesced — far fewer
      // read tasks than the static 32-partition plan would have run
      assert(plan.contains("AQEShuffleRead coalesced"), plan)
    }
  }
}
