package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-visible query: name → Spark plan + optional DuckDB oracle.
  *
  * Oracle parity rules (learned the hard way, see SparkEntry scaladoc):
  *  - cast doubles to DECIMAL *before* aggregating (order-insensitive),
  *  - never reduce decimal scale in a cast (DuckDB truncates, Spark
  *    rounds),
  *  - alias every computed column identically on both sides,
  *  - format timestamps to strings (or epoch integers) when the parquet
  *    source is nanosecond-precision — Spark reads ns as long, DuckDB as
  *    timestamp_ns; `CAST(ts AS TIMESTAMP)` in DuckDB matches Spark's
  *    `timestamp_micros(ts div 1000)` truncation.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
