package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._

/** Pins the whole-operator extension machinery: the custom AsOfJoinPlan
  * node must carry the declared semantics through the optimizer rewrite
  * — equal, row for row, to the independently implemented single-table
  * window form — appear in the logical plan, and vanish from the
  * optimized one.
  */
class AsOfPlanSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Set[(Long, Long, Long, Option[Long], Option[Long])] =
    EventQueries.defs.find(_.name == name).get.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet

  test("custom-plan as-of equals the single-table window form") {
    val viaPlan = rows("asof_plan_node")
    val viaWindow = rows("asof_attribution")
    assert(viaPlan == viaWindow,
      s"missing=${(viaWindow -- viaPlan).take(3)} extra=${(viaPlan -- viaWindow).take(3)}")
    // non-degenerate both ways: matched and unmatched purchases exist
    assert(viaPlan.exists(_._4.isDefined) && viaPlan.exists(_._4.isEmpty))
  }

  test("node visible in the logical plan, lowered away by optimization") {
    val df = EventQueries.defs.find(_.name == "asof_plan_node").get.fn(spark, dir)
    val logical = df.queryExecution.logical
    assert(logical.collectFirst {
      case n: org.apache.spark.sql.graft.AsOfJoinPlan => n
    }.isDefined, logical.treeString)
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.collectFirst {
      case n: org.apache.spark.sql.graft.AsOfJoinPlan => n
    }.isEmpty, optimized.treeString)
  }

  test("overlapping column names are rejected up front") {
    val d = spark.range(3).toDF("id")
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(d, d, "id", "id", "id", "id", "id", "id")
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
