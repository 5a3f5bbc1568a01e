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
  * Numeric-parity policy: aggregates over `double` columns are rounded
  * to integer cents — `floor(x * 100 + 0.5)` as BIGINT, see
  * [[graft.queries.QueryDef.cents]] — and the BIGINTs summed. Every op
  * is a single IEEE-754 double operation, so results are bit-identical
  * across engines AND engine versions; the BIGINT sum is exact and
  * order-insensitive. (Round 1 used `CAST(double AS DECIMAL)` before
  * summing — exact, but its boundary rounding is a DuckDB-version
  * implementation detail and the driver's DuckDB disagreed with the
  * local 1.0.0 on 8 queries. Doubles never meet DECIMAL now.)
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
      graft.queries.CurationQueries.defs ++
      graft.queries.DedupQueries.defs ++
      graft.queries.SimilarityQueries.defs ++
      graft.queries.MultimodalQueries.defs ++
      graft.queries.SetRollupQueries.defs ++
      graft.queries.TpchQueries.defs ++
      graft.queries.FileQueries.defs ++
      graft.queries.ProfilingQueries.defs

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap ++ Map(
    // §2.8 extension: hash aggregation (TPC-H Q1 shape). Reference has no
    // group-by node (SURVEY §2.8) — users push aggregation to source SQL;
    // here it is native: partial (map-side) agg + single shuffle on the
    // 6-value grouping key, filter pushed to the parquet scan.
    "q1_agg" -> ((s, dir) => {
      import graft.queries.QueryDef.cents
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_cents"),
          sum(cents(col("l_extendedprice"))).as("sum_base_price_cents"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("sum_disc_price_cents"),
          count(lit(1)).as("count_order"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap ++ Map(
    "q1_agg" -> {
      import graft.queries.QueryDef.centsSql
      s"""SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_cents,
        |  CAST(SUM(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_base_price_cents,
        |  CAST(SUM(${centsSql("l_extendedprice * (1.0 - l_discount)")}) AS BIGINT) AS sum_disc_price_cents,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
    }
  )
}
