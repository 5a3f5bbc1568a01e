package graft

import graft.operators.Aggregators
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkSuite {

  test("TopK aggregator matches window row_number top-k, with O(k) state") {
    val orders = spark.read.parquet(sf("orders"))
    val viaAgg = orders.groupBy(col("o_custkey"))
      .agg(Aggregators.topK(3, col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), explode(col("top")).as("o_orderkey"))

    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"))

    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
  }

  test("StableSample: deterministic across repartitionings") {
    val docs = spark.read.parquet(sf("documents"))
      .select(col("source"), col("doc_id"),
        graft.functions.TextFunctions.portableHash(col("doc_id").cast("string"), 7).as("rk"))
    def sample(parts: Int) = docs.repartition(parts)
      .groupBy(col("source"))
      .agg(Aggregators.stableSample(5, col("rk"), col("doc_id")).as("picks"))
      .select(col("source"), explode(col("picks")).as("doc_id"))
    val a = sample(2)
    val b = sample(13)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    assert(a.groupBy("source").count().collect().forall(_.getLong(1) <= 5))
  }

  test("built-in sketches: approx_count_distinct within rsd of exact") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val row = events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.05).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.15, s"$approx vs $exact")
  }

  test("approx_percentile tracks exact percentile within its accuracy contract") {
    // quantile_stats documents approx_percentile as the at-scale swap
    // for exact percentile (a full-sort-per-group vs a mergeable
    // sketch); this pins the swap's error. accuracy=1000 bounds the
    // RANK error by n/accuracy — convert to a value tolerance by
    // checking the approx result lands between the exact values at
    // rank ± n/accuracy.
    val li = spark.read.parquet(sf("lineitem")).select(col("l_extendedprice"))
    val n = li.count()
    val acc = 1000 // rank error ≤ n/1000
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr(s"approx_percentile(l_extendedprice, 0.5, $acc)").as("approx")).head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    val sorted = li.orderBy(col("l_extendedprice")).collect().map(_.getDouble(0))
    val slack = (n / acc + 1).toInt
    val (lo, hi) = (sorted(((n - 1) / 2 - slack).toInt.max(0)),
      sorted(((n - 1) / 2 + slack).toInt.min(sorted.length - 1)))
    assert(approx >= lo && approx <= hi, s"approx $approx outside [$lo, $hi] around exact $exact")
  }
}
