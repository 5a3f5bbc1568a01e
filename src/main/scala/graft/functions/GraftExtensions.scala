/* In the sql namespace for the same reason as VectorExpressions.scala:
 * function-registry registration types are private[sql]. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SparkSessionExtensions integration — the production path for making
  * the engine's native expressions available to plain SQL users on a
  * cluster:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
  *   ...
  *   SELECT graft_dot(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * [[GraftExtensions.register]] does the same for an already-running
  * session (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectFunction(GraftExtensions.nfcFunction)
    ext.injectFunction(GraftExtensions.phashFunction)
    ext.injectFunction(GraftExtensions.repStatsFunction)
    // whole-operator extension: lowers the custom AsOfJoinPlan node
    // (graft.plans.AsOf) during optimization; the table function is the
    // SQL surface constructing that node, so spark.sql(...) users get
    // the operator too:
    //   SELECT * FROM asof_join('purchases', 'clicks',
    //     'user_id', 'c_user', 'purchase_us', 'click_us',
    //     'event_id', 'click_event_id')
    ext.injectTableFunction(GraftExtensions.asofTableFunction)
    ext.injectOptimizerRule(session =>
      RewriteAsOfJoin(session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]))
  }
}

object GraftExtensions {

  private val dotInfo = new ExpressionInfo(
    classOf[DotProductExpr].getCanonicalName, "graft_dot")

  private def build(children: Seq[Expression]): Expression = {
    require(children.size == 2, s"graft_dot expects 2 arguments, got ${children.size}")
    DotProductExpr(children.head, children(1))
  }

  private[graft] val dotFunction =
    (FunctionIdentifier("graft_dot"), dotInfo, (children: Seq[Expression]) => build(children))

  private val nfcInfo = new ExpressionInfo(
    classOf[NfcNormalizeExpr].getCanonicalName, "graft_nfc")

  private def buildNfc(children: Seq[Expression]): Expression = {
    require(children.size == 1, s"graft_nfc expects 1 argument, got ${children.size}")
    NfcNormalizeExpr(children.head)
  }

  private[graft] val nfcFunction =
    (FunctionIdentifier("graft_nfc"), nfcInfo, (children: Seq[Expression]) => buildNfc(children))

  private val phashInfo = new ExpressionInfo(
    classOf[PortableHashExpr].getCanonicalName, "graft_phash")

  private def buildPhash(children: Seq[Expression]): Expression = {
    require(children.size == 2, s"graft_phash expects 2 arguments, got ${children.size}")
    val salt = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_phash salt must be an integer literal, got $other")
    }
    PortableHashExpr(children.head, salt)
  }

  private[graft] val phashFunction =
    (FunctionIdentifier("graft_phash"), phashInfo, (children: Seq[Expression]) => buildPhash(children))

  private val repStatsInfo = new ExpressionInfo(
    classOf[RepetitionStatsExpr].getCanonicalName, "graft_repetition_stats")

  private def buildRepStats(children: Seq[Expression]): Expression = {
    require(children.size == 1,
      s"graft_repetition_stats expects 1 argument, got ${children.size}")
    RepetitionStatsExpr(children.head)
  }

  private[graft] val repStatsFunction =
    (FunctionIdentifier("graft_repetition_stats"), repStatsInfo,
      (children: Seq[Expression]) => buildRepStats(children))

  private val asofInfo = new ExpressionInfo(
    classOf[AsOfJoinPlan].getCanonicalName, "asof_join")

  /** SQL TABLE-function surface of the as-of operator: 8 string
    * literals — two (possibly qualified) table/view names, then the
    * key/time/id column names of each side. Builds the same
    * [[AsOfJoinPlan]] node the Scala API builds, over
    * [[UnresolvedRelation]] children the analyzer resolves in place
    * (the node itself self-resolves once they do); [[RewriteAsOfJoin]]
    * then lowers it, re-validating the name contract there since this
    * path has no earlier choke point. */
  private def buildAsOf(children: Seq[Expression]): LogicalPlan = {
    require(children.size == 8 || children.size == 9,
      "asof_join expects 8 string-literal arguments (left_table, " +
        "right_table, left_key, right_key, left_time, right_time, " +
        "left_id, right_id) plus an optional direction " +
        s"('backward'|'forward', default backward), got ${children.size}")
    val args = children.map {
      case l: Literal if l.dataType == org.apache.spark.sql.types.StringType &&
          l.value != null => l.value.toString
      case other => throw new IllegalArgumentException(
        s"asof_join arguments must be non-null string literals, got $other")
    }
    val forward = args.lift(8) match {
      case None | Some("backward") => false
      case Some("forward") => true
      case Some(other) => throw new IllegalArgumentException(
        s"asof_join direction must be 'backward' or 'forward', got '$other'")
    }
    AsOfJoinPlan(
      UnresolvedRelation(args(0).split('.').toSeq),
      UnresolvedRelation(args(1).split('.').toSeq),
      args(2), args(3), args(4), args(5), args(6), args(7), forward)
  }

  private[graft] val asofTableFunction =
    (FunctionIdentifier("asof_join"), asofInfo,
      (children: Seq[Expression]) => buildAsOf(children))

  /** Register the engine's SQL functions into an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_dot", build, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_nfc", buildNfc, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_phash", buildPhash, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_repetition_stats", buildRepStats, "built-in")
    spark.sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction("asof_join", buildAsOf, "built-in")
    // the SQL surface needs the lowering rule too (cluster deployments
    // get both atomically via spark.sql.extensions)
    AsOfJoin.ensureInstalled(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
  }
}
