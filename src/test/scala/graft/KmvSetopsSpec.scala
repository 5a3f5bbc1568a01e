package graft

import graft.queries.ProfilingQueries
import org.apache.spark.sql.functions._

/** Pins the KMV set-algebra contracts of `distinct_kmv_setops`: sub-k
  * sketches degrade to EXACT set algebra, union/intersection estimates
  * track ground truth within sketch-accuracy bounds on a large planted
  * overlap, and the inclusion-exclusion identity holds on the exact
  * side.
  */
class KmvSetopsSpec extends SparkSuite {

  private def run(dir: String) =
    ProfilingQueries.defs.find(_.name == "distinct_kmv_setops").get.fn(spark, dir)

  test("sf0.001 is the sub-k regime: estimates are EXACT") {
    val out = run("/root/testdata/sf0.001").collect()
    assert(out.length == 10) // C(5,2) event-type pairs
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"union est ${r.getLong(3)} != exact ${r.getLong(2)} (${r.getString(0)},${r.getString(1)})")
      assert(r.getLong(4) == r.getLong(5),
        s"inter est ${r.getLong(5)} != exact ${r.getLong(4)}")
    }
  }

  test("planted big overlap: estimates within 35% of truth past k") {
    import spark.implicits._
    val d = tmpDir("kmvset")
    val base = 1723600000000000L
    // 6000 users hit type 'a'; users 2000..7999 hit type 'b' →
    // union 8000, intersection 4000 — far past k=64
    val rows =
      (0L until 6000L).map(u => (u + 1L, base + u, u, "a", 0.0, "{}")) ++
        (2000L until 8000L).map(u => (10000L + u, base + u, u, "b", 0.0, "{}"))
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = run(d).collect()
    assert(r.length == 1)
    val (uEx, uEst, iEx, iEst) =
      (r(0).getLong(2), r(0).getLong(3), r(0).getLong(4), r(0).getLong(5))
    assert(uEx == 8000L && iEx == 4000L)
    assert(math.abs(uEst - uEx).toDouble / uEx < 0.35, s"union est $uEst")
    assert(math.abs(iEst - iEx).toDouble / iEx < 0.35, s"inter est $iEst")
  }

  test("inclusion-exclusion holds on the exact side at sf0.01") {
    val out = run("/root/testdata/sf0.01").collect()
    val perType = Tables.events(spark, "/root/testdata/sf0.01")
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == perType(a) + perType(b) - r.getLong(4))
    }
  }
}
