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

  /** The events table is written with nanosecond timestamps, which
    * Spark's parquet reader rejects by default. Read `ts` as raw nanos
    * (`nanosAsLong`) and truncate to a microsecond TimestampType — the
    * DuckDB-side equivalent is `CAST(ts AS TIMESTAMP)`. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    apply(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
