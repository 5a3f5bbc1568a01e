package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * Every query entry point receives `(spark, sfDir)` and resolves tables
  * through here so the same code runs at any scale factor. At cluster
  * scale the path would be a table identifier / catalog lookup instead;
  * the indirection keeps that swap local to this object.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` has shipped with different physical
    * encodings across testdata generations (int64 nanoseconds, then
    * `timestamp[us]`), and an engine must take whatever the source
    * yields rather than hard-code one width (the reference's extractors
    * are likewise encoding-agnostic — `src/Extractors/PdoExtractor.php:66`
    * passes rows through as the driver delivers them). So: read with
    * `nanosAsLong` enabled (a no-op for non-nano files), then normalize
    * on the column's ACTUAL type —
    *   - `LongType`            → raw nanos; truncate to a microsecond
    *                             TimestampType,
    *   - `TimestampType`       → already session-zoned micros; pass through,
    *   - `TimestampNTZType`    → cast to TimestampType (the session runs
    *                             UTC, so the instant is unchanged and the
    *                             driver's schema check + DuckDB
    *                             `CAST(ts AS TIMESTAMP)` oracle agree),
    *   - anything else         → fail loudly naming the type, instead of
    *                             letting 13 downstream queries die in
    *                             analysis. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integer `div`, NOT `/`: double division loses precision above
        // 2^53 and epoch-nanos are ~1.7e18
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: unsupported physical type $other (expected " +
            s"INT64 nanos, TIMESTAMP, or TIMESTAMP_NTZ) in $dir/events.parquet")
    }
  }
}
