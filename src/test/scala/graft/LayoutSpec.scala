package graft

import graft.functions.LayoutFunctions.zorder16
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the point of Z-order layout: after a range-partitioned write on
  * the z key, each output file's bounding box in (customer, day) space
  * is far smaller than under a z-agnostic layout — which is exactly
  * what parquet row-group min/max skipping consumes. The assertion is
  * on the real written files (grouped by input_file_name), not on an
  * abstraction.
  */
class LayoutSpec extends SparkSuite {

  private def withZ: DataFrame =
    spark.read.parquet(sf("orders"))
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("day"))
      .withColumn("z", zorder16(col("o_custkey"), col("day")))

  /** Sum over written files of the (custkey × day) bounding-box area. */
  private def totalBoxArea(df: DataFrame, out: String): Long = {
    df.write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
      .groupBy(input_file_name())
      .agg(((max(col("o_custkey")) - min(col("o_custkey")) + 1) *
        (max(col("day")) - min(col("day")) + 1)).as("area"))
      .agg(sum(col("area"))).head.getLong(0)
  }

  test("z-order clustering shrinks per-file bounding boxes vs a z-agnostic layout") {
    val dir = tmpDir("zorder")
    val zArea = totalBoxArea(
      withZ.repartitionByRange(8, col("z")), s"$dir/zordered")
    val naiveArea = totalBoxArea(
      withZ.repartitionByRange(8, col("o_orderkey")), s"$dir/naive")
    // the naive layout's files each span ~the whole (cust, day) domain;
    // z-ordered files cover ~1/8 of the curve each. Demand ≥4× total
    // shrink — comfortably below the theoretical gap, far above noise.
    assert(zArea * 4 <= naiveArea, s"zArea=$zArea naiveArea=$naiveArea")
  }

  test("zorder16 interleaves bits exactly (reference values)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (65535L, 0L),
      (0L, 65535L), (12345L, 54321L))
      .toDF("a", "b")
      .withColumn("z", zorder16(col("a"), col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def ref(a: Long, b: Long): Long =
      (0 until 16).map { i =>
        (((a >> i) & 1L) << (2 * i)) + (((b >> i) & 1L) << (2 * i + 1))
      }.sum
    rows.foreach { case (a, b, z) => assert(z == ref(a, b), s"($a,$b)") }
    // the two axes interleave without collision: distinct inputs in
    // range give distinct codes
    assert(ref(1, 0) == 1L && ref(0, 1) == 2L && ref(1, 1) == 3L)
    assert(ref(65535, 65535) == 0xFFFFFFFFL)
  }
}
