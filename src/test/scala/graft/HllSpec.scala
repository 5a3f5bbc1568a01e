package graft

import graft.queries.ProfilingQueries
import org.apache.spark.sql.functions._

/** Pins `distinct_hll` against a driver-scale reimplementation of the
  * same register fold and integer estimator — partition boundaries and
  * the map-side MAX merge must cancel out bit for bit — plus the
  * linear-counting branch on a corpus small enough to leave registers
  * empty, and the standard-error accuracy contract on the real corpus.
  */
class HllSpec extends SparkSuite {

  /** The query's exact estimator, recomputed on the driver from raw
    * (event_type, user_id) pairs via the JVM hash twin. */
  private def driverHll(pairs: Seq[(String, Long)]): Map[String, Long] = {
    val alphaNum = BigInt("104680255103913656422760448")
    pairs.groupBy(_._1).map { case (tpe, rows) =>
      val regs = new Array[Long](64)
      rows.foreach { case (_, uid) =>
        val h = graft.functions.TextFunctions.portableHashJvm(uid.toString, 83)
        val j = (h % 64).toInt
        val w = h / 64
        val rho =
          if (w == 0L) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(j)) regs(j) = rho
      }
      var s = BigInt(0); var v = 0L
      regs.foreach { m => if (m == 0L) v += 1; s += BigInt(1) << (55 - m.toInt) }
      val nRaw = (alphaNum / (s * 1000000)).toLong
      val nEst =
        if (v > 0 && nRaw <= 160L)
          (64L * math.floor(math.log(64.0 / v) * 1e6 + 0.5).toLong) / 1000000L
        else nRaw
      tpe -> nEst
    }
  }

  private def run(dir: String): Map[String, (Long, Long)] =
    ProfilingQueries.defs.find(_.name == "distinct_hll").get
      .fn(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("distinct_hll equals the driver-scale register fold bit for bit") {
    val dir = "/root/testdata/sf0.001"
    val pairs = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = driverHll(pairs)
    val got = run(dir)
    assert(got.keySet == expected.keySet)
    got.foreach { case (tpe, (_, est)) =>
      assert(est == expected(tpe), s"$tpe: $est != ${expected(tpe)}")
    }
  }

  test("linear-counting branch engages on a small corpus and lands near-exact") {
    import spark.implicits._
    val d = tmpDir("hll_small")
    val base = 1723600000000000L
    // 6 distinct users across 10 events — far under 2.5m, registers
    // mostly empty → the m·ln(m/V) correction must fire
    val rows = (1 to 10).map { i =>
      (i.toLong, base + i * 1000000L, (i % 6 + 1).toLong, "click", 0.0, "{}")
    }
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = run(d)
    val (nExact, nEst) = got("click")
    assert(nExact == 6L)
    // LC at this density is near-exact: ±1 around the true count
    assert(math.abs(nEst - 6L) <= 1L, s"lc estimate $nEst too far from 6")
    // and it matches the driver fold exactly
    val expected = driverHll((1 to 10).map(i => ("click", (i % 6 + 1).toLong)))
    assert(nEst == expected("click"))
  }

  test("estimate lands inside 3x the HLL standard error on the real corpus") {
    // se(m=64) = 1.04/sqrt(64) = 13%; 3x = 39% — generous but real:
    // a broken register fold is off by orders of magnitude
    val got = run("/root/testdata/sf0.01")
    assert(got.nonEmpty)
    got.foreach { case (tpe, (exact, est)) =>
      assert(exact > 0L)
      val err = math.abs(est - exact).toDouble / exact
      assert(err <= 0.39, s"$tpe: est $est vs exact $exact (err $err)")
    }
  }
}
