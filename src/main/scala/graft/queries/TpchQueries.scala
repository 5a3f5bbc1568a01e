package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** TPC-H-shaped analytical queries over the star schema — breadth
  * proof for multi-join + aggregation plans (Q3/Q5/Q10/Q14 shapes,
  * adapted to the driver testdata's columns). Numeric parity via
  * integer cents ([[QueryDef.cents]]); dates are formatted to strings
  * at the output boundary.
  *
  * Plan shapes to note at scale: the fact table (lineitem) is never on
  * a broadcast side; nation/region carry an explicit broadcast hint
  * (fixed 25/5 rows at every scale factor), while customer/supplier/
  * part — which grow linearly with SF — carry NO hint: AQE's size
  * threshold decides at runtime, so the same plan that broadcasts them
  * at sf0.1 shuffle-joins them at 100 TB instead of OOMing the build
  * side. Aggregations are partial before their single shuffle.
  */
object TpchQueries {

  /** SUM of IEEE-exact revenue cents (BIGINT both sides — exact,
    * order-insensitive, oracle-version-independent). */
  private def revenue = sum(QueryDef.cents(
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
  private val revenueSql =
    s"CAST(SUM(${QueryDef.centsSql("l_extendedprice * (1.0 - l_discount)")}) AS BIGINT)"

  val defs: Seq[QueryDef] = Seq(

    // Q3 shape: shipping-priority — segment-filtered customer ⋈ orders
    // ⋈ lineitem, top-10 open orders by revenue
    QueryDef("tpch_q3",
      (s, dir) => {
        val c = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = Tables(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
        val l = Tables(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            col("o_orderpriority"))
          .agg(revenue.as("revenue_cents"))
          .orderBy(col("revenue_cents").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
              |  o_orderpriority, $revenueSql AS revenue_cents
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
              |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
              |GROUP BY 1, 2, 3
              |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin)),

    // Q5 shape: local-supplier volume — 6-table join, revenue per
    // nation within one region, customer and supplier in the SAME
    // nation (the classic cyclic join condition)
    QueryDef("tpch_q5",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders")
        val l = Tables(s, dir, "lineitem")
        val sup = Tables(s, dir, "supplier")
        val n = Tables(s, dir, "nation")
        val r = Tables(s, dir, "region").filter(col("r_name") === "ASIA")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(sup,
            l("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
          .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(revenue.as("revenue_cents"), count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT n_name, $revenueSql AS revenue_cents, COUNT(*) AS n_items
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              |JOIN nation ON s_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |GROUP BY n_name""".stripMargin)),

    // Q10 shape: returned-item losses per customer, top 20
    QueryDef("tpch_q10",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders")
        val l = Tables(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        val n = Tables(s, dir, "nation")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(revenue.as("revenue_cents"))
          .orderBy(col("revenue_cents").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, n_name, $revenueSql AS revenue_cents
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |WHERE l_returnflag = 'R'
              |GROUP BY 1, 2, 3
              |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin)),

    // Q14-ish shape: revenue share per part brand (fact ⋈ part dim)
    QueryDef("tpch_brand_share",
      (s, dir) => {
        val l = Tables(s, dir, "lineitem")
        val p = Tables(s, dir, "part")
        // exact cents SUM, not AVG: emit SUM + COUNT and let the reader
        // divide — engine AVG result types/rounding differ across
        // versions, integer sums never do
        l.join(p, l("l_partkey") === p("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(revenue.as("revenue_cents"), count(lit(1)).as("n_items"),
            sum(QueryDef.cents(col("p_retailprice"))).as("sum_retail_cents"))
      },
      Some(s"""SELECT p_brand, $revenueSql AS revenue_cents, COUNT(*) AS n_items,
              |  CAST(SUM(${QueryDef.centsSql("p_retailprice")}) AS BIGINT) AS sum_retail_cents
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |GROUP BY p_brand""".stripMargin))
  )
}
