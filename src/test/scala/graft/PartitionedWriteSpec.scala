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

  test("OrcSink carries the same partitioned + sized layout; ORC reads prune") {
    val out = tmpDir("orc_partwrite")
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    graft.sinks.OrcSink(s"$out/events", partitionBy = Seq("event_type"),
      maxRecordsPerFile = Some(400L)).write(events.coalesce(1))
    val dirs = new java.io.File(s"$out/events").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("event_type=")), dirs.toString)
    val read = spark.read.orc(s"$out/events").filter(col("event_type") === "click")
    val plan = read.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert(read.count() == events.filter(col("event_type") === "click").count())
    // file sizing holds per partition directory
    val perFile = spark.read.orc(s"$out/events")
      .groupBy(input_file_name()).count().collect().map(_.getLong(1))
    assert(perFile.forall(_ <= 400L), perFile.mkString(","))
  }

  test("per-sink compression codec: zstd files written, read-back identical") {
    // codec choice is a per-sink tiering decision at 100 TB (archive
    // zstd vs hot snappy) — pin that the option reaches the writer
    // (file names carry the codec) and round-trips losslessly
    val out = tmpDir("codec_write")
    val orders = spark.read.parquet(sf("orders"))
    ParquetSink(s"$out/zstd", compression = Some("zstd")).write(orders)
    val files = new java.io.File(s"$out/zstd").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
    assert(files.nonEmpty && files.forall(_.contains(".zstd.")), files.mkString(","))
    assert(spark.read.parquet(s"$out/zstd").count() == orders.count())
    graft.sinks.OrcSink(s"$out/orc_zstd", compression = Some("zstd")).write(orders)
    val ofiles = new java.io.File(s"$out/orc_zstd").listFiles()
      .map(_.getName).filter(_.endsWith(".orc"))
    assert(ofiles.nonEmpty && ofiles.forall(_.contains(".zstd.")), ofiles.mkString(","))
    assert(spark.read.orc(s"$out/orc_zstd").count() == orders.count())
  }

  test("dynamic partition overwrite replaces only the incoming partitions") {
    // the daily-increment idiom at scale: a batch carrying one
    // partition's worth of corrected data must replace THAT partition
    // and leave every other partition untouched; the default STATIC
    // overwrite would truncate the whole table first
    import spark.implicits._
    val out = tmpDir("dyn_overwrite")
    val base = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("c", 100L))
      .toDF("part", "v")
    ParquetSink(s"$out/t", partitionBy = Seq("part")).write(base)
    // corrected batch for partition "a" only
    val patch = Seq(("a", 99L)).toDF("part", "v")
    ParquetSink(s"$out/t", partitionBy = Seq("part"),
      dynamicPartitionOverwrite = true).write(patch)
    val got = spark.read.parquet(s"$out/t")
      .collect().map(r => (r.getAs[String]("part"), r.getAs[Long]("v"))).toSet
    assert(got == Set(("a", 99L), ("b", 10L), ("c", 100L)))
    // and without the knob, STATIC overwrite truncates everything else
    ParquetSink(s"$out/t", partitionBy = Seq("part")).write(patch)
    val afterStatic = spark.read.parquet(s"$out/t")
      .collect().map(r => (r.getAs[String]("part"), r.getAs[Long]("v"))).toSet
    assert(afterStatic == Set(("a", 99L)))
    // OrcSink mirrors the same per-write knob
    graft.sinks.OrcSink(s"$out/o", partitionBy = Seq("part")).write(base)
    graft.sinks.OrcSink(s"$out/o", partitionBy = Seq("part"),
      dynamicPartitionOverwrite = true).write(patch)
    val gotOrc = spark.read.orc(s"$out/o")
      .collect().map(r => (r.getAs[String]("part"), r.getAs[Long]("v"))).toSet
    assert(gotOrc == Set(("a", 99L), ("b", 10L), ("c", 100L)))
  }

  test("ParquetSink maxRecordsPerFile rolls files at the record cap") {
    import graft.sinks.ParquetSink
    val out = tmpDir("sized_write")
    val orders = spark.read.parquet(sf("orders")).coalesce(1) // 1500 rows, one task
    ParquetSink(s"$out/orders", maxRecordsPerFile = Some(400L)).write(orders)
    val perFile = spark.read.parquet(s"$out/orders")
      .groupBy(input_file_name()).count().collect().map(_.getLong(1))
    assert(perFile.forall(_ <= 400L), perFile.mkString(","))
    assert(perFile.length >= 4) // 1500 rows / 400 cap → ≥4 files from ONE task
    assert(perFile.sum == orders.count())
  }
}
