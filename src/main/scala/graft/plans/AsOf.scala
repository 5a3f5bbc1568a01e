package graft.plans

import org.apache.spark.sql.DataFrame

/** Public API for the custom as-of join operator (see
  * [[org.apache.spark.sql.graft.AsOfJoinPlan]] for the node and the
  * lowering rule). For each left row: the latest right row with the
  * same key strictly before it in (time, id) order — or, with
  * `forward = true`, the earliest right row strictly after; right
  * columns NULL when none exists. Column names across the two sides
  * must be disjoint. */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      leftId: String, rightId: String,
      forward: Boolean = false): DataFrame =
    org.apache.spark.sql.graft.AsOfJoin.df(
      left.asInstanceOf[org.apache.spark.sql.classic.DataFrame],
      right.asInstanceOf[org.apache.spark.sql.classic.DataFrame],
      leftKey, rightKey, leftTime, rightTime, leftId, rightId, forward)
}
