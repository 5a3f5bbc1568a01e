package graft

import org.apache.spark.sql.functions._

/** Bucketing: the co-located-join strategy for repeated big joins on
  * the same key. Both tables bucketed by the join key → the join needs
  * NO exchange at all (each bucket pair joins locally). At 100 TB this
  * is the difference between re-shuffling the fact table on every
  * pipeline run and shuffling once at ingest.
  */
class BucketedJoinSpec extends SparkSuite {

  test("join between tables bucketed on the key runs without any Exchange") {
    val s = spark
    s.conf.set("spark.sql.sources.bucketing.enabled", "true")
    // bucketed ingest: one shuffle each, paid once
    s.read.parquet(sf("orders"))
      .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    s.read.parquet(sf("customer"))
      .write.mode("overwrite").bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
    try {
      val o = s.table("orders_bkt")
      val c = s.table("customer_bkt")
      // disable broadcast so the co-location is what avoids the shuffle
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = o.join(c, o("o_custkey") === c("c_custkey"))
          .select(col("o_orderkey"), col("c_name"))
        joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        assert(!plan.contains("Exchange"), plan)
        assert(joined.count() == s.read.parquet(sf("orders")).count())
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    } finally {
      s.sql("DROP TABLE IF EXISTS orders_bkt")
      s.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
