package graft

import graft.sinks.ParquetSink
import org.apache.spark.sql.functions._

/** Partitioned layout + partition pruning: at 100 TB, writing
  * time/category-partitioned parquet and pruning partitions at read
  * time is the difference between scanning a day and scanning a year.
  */
class PartitionedWriteSpec extends SparkSuite {

  test("ParquetSink partitionBy produces prunable layout; reads prune") {
    val out = tmpDir("partwrite")
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    ParquetSink(s"$out/events", partitionBy = Seq("event_type")).write(events)

    // hive-style directory per partition value
    val dirs = new java.io.File(s"$out/events").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("event_type=")), dirs.toString)

    // a filter on the partition column becomes a PartitionFilter — no
    // data files outside the matching partition are read
    val read = spark.read.parquet(s"$out/events").filter(col("event_type") === "click")
    val plan = read.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    val expected = events.filter(col("event_type") === "click").count()
    assert(read.count() == expected)
  }
}
