/* In the sql namespace for the same reason as VectorExpressions.scala:
 * Dataset.ofRows and the logical-plan surface are private[sql]; this is
 * the established pattern for extension libraries shipping custom
 * operators. graft.plans.AsOf re-exports the public API. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Custom WHOLE-OPERATOR extension — the (c) tier of the engine's
  * design rules (compose built-ins > custom Expression > custom
  * LogicalPlan + Rule > mapPartitions): a first-class AS-OF JOIN
  * logical operator. Spark has no native as-of join; the engine's
  * single-table form (`asof_attribution`) hand-writes a window, but a
  * LIBRARY operator wants declarative semantics the optimizer sees and
  * rewrites — this node carries exactly the as-of semantics ("for each
  * left row, the latest right row with the same key strictly before it
  * in ((time, id)) order, NULLs when none") and
  * [[RewriteAsOfJoin]] lowers it during OPTIMIZATION into the
  * windowed-join form Catalyst already plans well (key-partitioned
  * equi-join with a residual time predicate + per-left-row rank-1
  * window — both sides shuffle once on the key at any scale).
  *
  * The node is self-resolving (output = children's attributes, right
  * side nullability widened) so analysis passes it through; planning
  * would fail if the rule were missing, which [[AsOfJoin.ensureInstalled]]
  * makes impossible for API users (idempotent
  * `experimental.extraOptimizations` install; cluster SQL users get
  * the same rule via [[GraftExtensions]]'s injectOptimizerRule).
  * Column names across the two sides must be disjoint — the operator's
  * output is their concatenation. `leftId` must uniquely identify a
  * left row WITHIN its key (the natural event-id-per-entity contract);
  * the lowering's rank window partitions on (key, id), so duplicate
  * ids under different keys are fine, while a duplicate (key, id)
  * pair would collapse to one output row.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: String, rightKey: String,
    leftTime: String, rightTime: String,
    leftId: String, rightId: String) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // the node carries its key/time/id columns as STRINGS, so the default
  // expression-derived references are empty and ColumnPruning would
  // strip "unused" child columns the lowering still needs (observed:
  // the right key vanished when the final projection didn't select it).
  // Every child output is semantically referenced — say so.
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Lowers [[AsOfJoinPlan]] to the windowed-join form. Runs in the
  * optimizer (the node resolves itself, so analysis needs no help);
  * attribute identity is preserved by building the rewrite FROM the
  * node's own children and projecting back to their attributes, so
  * downstream operators' references stay valid. */
case class RewriteAsOfJoin(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case n @ AsOfJoinPlan(l, r, lk, rk, lt, rt, lid, rid) =>
      val lDf = Dataset.ofRows(spark, l).as("gl")
      val rDf = Dataset.ofRows(spark, r).as("gr")
      val joined = lDf.join(rDf,
        col(s"gl.$lk") === col(s"gr.$rk") &&
          (col(s"gr.$rt") < col(s"gl.$lt") ||
            (col(s"gr.$rt") === col(s"gl.$lt") &&
              col(s"gr.$rid") < col(s"gl.$lid"))),
        "left_outer")
      // partition by (key, id), not id alone: leftId's uniqueness
      // contract is WITHIN its key (event ids per entity) — two left
      // rows under different keys may legitimately share an id value,
      // and an id-only partition would silently collapse them into one
      // output row
      val w = Window.partitionBy(col(s"gl.$lk"), col(s"gl.$lid"))
        .orderBy(col(s"gr.$rt").desc_nulls_last, col(s"gr.$rid").desc_nulls_last)
      val rewritten = joined
        .withColumn("__graft_asof_rn", row_number().over(w))
        .filter(col("__graft_asof_rn") === 1)
        .select(n.output.map(a => col(a.name)): _*)
      // OPTIMIZED, not analyzed: this rule runs in
      // experimental.extraOptimizations — the tail of the optimizer —
      // so the substituted subtree gets no further optimizer passes,
      // and an analyzed subtree still carries SubqueryAlias nodes the
      // planner refuses ("No plan for SubqueryAlias", observed)
      rewritten.queryExecution.optimizedPlan
  }
}

object AsOfJoin {

  /** Install [[RewriteAsOfJoin]] into an existing session (idempotent).
    * Cluster deployments get it at session build via
    * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`. */
  def ensureInstalled(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[RewriteAsOfJoin]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteAsOfJoin(spark)

  /** Public constructor: an as-of-joined DataFrame carrying the custom
    * logical node (visible in `.queryExecution.logical`; gone after
    * optimization). */
  def df(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      leftId: String, rightId: String): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"as-of join sides must have disjoint column names; overlap: $overlap")
    val spark = left.sparkSession.asInstanceOf[SparkSession]
    ensureInstalled(spark)
    Dataset.ofRows(spark, AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      leftKey, rightKey, leftTime, rightTime, leftId, rightId))
  }
}
