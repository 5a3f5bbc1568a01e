package graft

import graft.core.{JoinSpec, Pipeline}
import graft.sources.ParquetSource
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan audits: the scale guarantees the engine promises are
  * plan *shapes*, not timings — filters reach the parquet scan, small
  * dims broadcast, aggregations are partial before the shuffle, hot
  * expressions stay inside whole-stage codegen. Timings vary with the
  * machine; these properties must not.
  */
class PlanAuditSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  test("filter + projection push down to the parquet scan") {
    val p = plan(SparkEntry.queries("scan_project_filter")(spark, dir))
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThan(l_quantity"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    // column pruning: the 16-column lineitem scan reads only what the
    // query touches
    val readSchema = p.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment"), readSchema)
    assert(!readSchema.contains("l_shipdate"), readSchema)
  }

  test("pipeline dim join broadcasts (no shuffle of the fact side)") {
    val df = Pipeline
      .from(ParquetSource(s"$dir/orders.parquet"))
      .join(JoinSpec(ParquetSource(s"$dir/customer.parquet"), "o_custkey", "c_custkey"))
      .toDF(spark)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q1_agg: partial (map-side) aggregation before the exchange") {
    val p = plan(SparkEntry.queries("q1_agg")(spark, dir))
    // partial_sum before the Exchange, final sum after = map-side combine
    assert(p.contains("partial_sum"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert("Exchange".r.findAllIn(plan(SparkEntry.queries("q1_agg")(spark, dir))).size >= 1, p)
  }

  test("join_chained: both dims broadcast, single shuffle for the agg") {
    val p = plan(SparkEntry.queries("join_chained")(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("native dot product stays inside whole-stage codegen") {
    val df = SparkEntry.queries("ann_bruteforce")(spark, dir)
    assert(plan(df).contains("graft_dot"), plan(df))
    // WholeStageCodegen spans only materialize in the executed plan
    // under AQE — run the query, then audit
    df.collect()
    // AQE prints Final and Initial sections; audit the final plan only
    val executed = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // '*(n)' marks operators fused into a WholeStageCodegen stage —
    // every projection evaluating graft_dot must carry it
    val hot = executed.linesIterator.filter(_.contains("graft_dot")).toSeq
    assert(hot.nonEmpty, executed)
    assert(hot.forall(_.contains("*(")), hot.mkString("\n"))
  }

  test("window_topk: exactly one exchange (partitionBy key) feeds the window") {
    val p = plan(SparkEntry.queries("window_topk")(spark, dir))
    assert(p.contains("Window"), p)
    assert("hashpartitioning\\(o_custkey".r.findAllIn(p).size >= 1, p)
    assert("(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size == 1, p)
  }

  test("graft_dot is SQL-callable after extensions registration") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    spark.read.parquet(s"$dir/embeddings.parquet").createOrReplaceTempView("emb_v")
    val r = spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS n2 FROM emb_v WHERE vec_id < 3")
      .collect()
    assert(r.length == 3)
    assert(r.forall(_.getDouble(1) > 0.0))
  }

  test("correlated scalar subquery is decorrelated to aggregate + join") {
    val p = plan(SparkEntry.queries("sql_correlated")(spark, dir))
    // no per-row subquery execution: Catalyst rewrites to agg + join
    assert(!p.contains("ScalarSubquery"), p)
    assert(p.contains("HashAggregate") || p.contains("Aggregate"), p)
    assert(p.contains("Join") || p.contains("BroadcastHashJoin"), p)
  }

  test("limit_offset: global limit, no full materialization") {
    val p = plan(SparkEntry.queries("limit_offset")(spark, dir))
    assert(p.contains("GlobalLimit") || p.contains("TakeOrderedAndProject"), p)
  }
}
