package graft

import org.apache.spark.sql.SparkSession

/** Pins the CLUSTER wiring path: a session built with
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  * (what spark-submit deployments set) must get the native functions,
  * the asof_join table function, AND the lowering rule — with no
  * in-session `register()` call. The other specs exercise the
  * in-session path; if this one breaks, the library works in tests and
  * notebooks but not on a real cluster.
  */
class ExtensionsWiringSpec extends SparkSuite {

  test("spark.sql.extensions wires functions, table function, and the as-of lowering") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // reuses the suite's SparkContext; a NEW SparkSession instance is
    // built (defaults were cleared) and extensions apply at build time
    val s2 = SparkSession.builder()
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .getOrCreate()
    try {
      import s2.implicits._
      val d = s2.sql(
        "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head().getDouble(0)
      assert(d == 11.0)
      Seq((1L, 10L, 100L)).toDF("lk", "lt", "lid").createOrReplaceTempView("ext_l")
      Seq((1L, 5L, 7L), (1L, 20L, 9L)).toDF("rk", "rt", "rid")
        .createOrReplaceTempView("ext_r")
      try {
        val rows = s2.sql(
          "SELECT * FROM asof_join('ext_l', 'ext_r', 'lk', 'rk', 'lt', 'rt', 'lid', 'rid')")
          .collect()
        // rt=5 is strictly before lt=10 and matches; rt=20 is after
        assert(rows.length == 1, rows.mkString(","))
        assert(rows.head.getLong(5) == 7L, rows.head)
        // forward direction through the SQL arg on the same session
        val fwd = s2.sql(
          "SELECT * FROM asof_join('ext_l', 'ext_r', 'lk', 'rk', 'lt', 'rt', 'lid', 'rid', 'forward')")
          .collect()
        assert(fwd.length == 1 && fwd.head.getLong(5) == 9L, fwd.mkString(","))
      } finally {
        s2.catalog.dropTempView("ext_l")
        s2.catalog.dropTempView("ext_r")
      }
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
