package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or an
  * LLM-pipeline extension operator), expressed Spark-first. Each entry in
  * [[oracleSql]] is the ANSI-SQL equivalent the driver runs in DuckDB on
  * the same parquet tables; column names/aliases match exactly.
  *
  * Numeric-parity policy: aggregates over `double` columns are cast to
  * DECIMAL **before** summation in both engines, so the arithmetic is
  * exact and order-insensitive (a double sum would differ in low-order
  * bits between Spark's partition-ordered sum and DuckDB's sequential
  * one). Final aggregates are cast to a pinned DECIMAL type so the
  * output scale matches on both sides — and that cast must NEVER reduce
  * the scale: DuckDB truncates on decimal downscale while Spark rounds
  * HALF_UP, so a scale-reducing cast diverges by one ulp on ~half the
  * groups.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** All registered query modules (one QueryDef per operator). */
  private def allDefs: Seq[graft.queries.QueryDef] =
    graft.queries.RelationalQueries.defs ++
      graft.queries.EventQueries.defs ++
      graft.queries.TextQueries.defs ++
      graft.queries.DedupQueries.defs ++
      graft.queries.SimilarityQueries.defs ++
      graft.queries.MultimodalQueries.defs ++
      graft.queries.SetRollupQueries.defs ++
      graft.queries.TpchQueries.defs

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap ++ Map(
    // §2.8 extension: hash aggregation (TPC-H Q1 shape). Reference has no
    // group-by node (SURVEY §2.8) — users push aggregation to source SQL;
    // here it is native: partial (map-side) agg + single shuffle on the
    // 6-value grouping key, filter pushed to the parquet scan.
    "q1_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(12,2)")).cast("decimal(18,2)").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(12,2)")).cast("decimal(18,2)").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
            .cast("decimal(18,4)").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap ++ Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
