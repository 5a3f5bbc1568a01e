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

  test("duplicate and dotted column names within one side are rejected up front") {
    import spark.implicits._
    val l = Seq((1L, 2L)).toDF("k", "k")   // duplicate name on one side
    val r = Seq((1L, 2L)).toDF("rk", "rt")
    val dup = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(l, r, "k", "rk", "k", "rt", "k", "rk")
    }
    assert(dup.getMessage.contains("duplicate"))
    val dotted = Seq((1L, 2L, 3L)).toDF("a.b", "t", "i")
    val dot = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(dotted, r, "a.b", "rk", "t", "rt", "i", "rk")
    }
    assert(dot.getMessage.contains("'.'"))
  }

  test("the lowering is the linear merge form: NO join in the optimized plan") {
    // The round-10 scale-killer: the old lowering (left_outer join on
    // key + rank-1) built a C×P intermediate per hot key. The merge
    // form unions the tagged sides and windows once — assert the join
    // is GONE and the window's input is the one key exchange.
    val df = EventQueries.defs.find(_.name == "asof_plan_node").get.fn(spark, dir)
    val opt = df.queryExecution.optimizedPlan
    val joins = opt.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, s"as-of lowering reintroduced a join:\n${opt.treeString}")
    assert(opt.collectFirst {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.isDefined, opt.treeString)
    // physical: exactly one exchange feeds the as-of window, keyed on
    // the join key (high cardinality — never a single-partition
    // funnel). AQE off so the exchanges are visible (with AQE on,
    // executedPlan is a leaf AdaptiveSparkPlanExec collect() can't
    // descend into — same caveat as the funnel sweep).
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val phys = EventQueries.defs.find(_.name == "asof_plan_node").get.fn(spark, dir)
        .queryExecution.executedPlan
      val wins = phys.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(wins.nonEmpty, phys.treeString)
      assert(wins.forall(_.child.outputPartitioning.numPartitions > 1),
        phys.treeString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("pit_feature_join: inclusive PIT semantics via the sentinel id, no join in the plan") {
    // the sentinel-right-id trick turns the node's strictly-before
    // contract into valid_from <= ts INCLUSIVE — pin it on constructed
    // versions where a fact lands EXACTLY on a version start, plus the
    // pre-first-version NULL case
    import spark.implicits._
    val versions = Seq(
      (7L, 1L, "bronze", 1000L), (7L, 2L, "gold", 2000L))
      .toDF("d_user", "version", "tier", "valid_from_us")
      .withColumn("d_rid", org.apache.spark.sql.functions.lit(Long.MinValue)
        + org.apache.spark.sql.functions.col("version"))
    val facts = Seq(
      (101L, 7L, 999L),   // before any version -> NULL tier
      (102L, 7L, 1000L),  // exactly ON a version start -> inclusive match
      (103L, 7L, 1999L),  // mid-interval -> bronze
      (104L, 7L, 2000L))  // exactly on the upgrade instant -> gold
      .toDF("event_id", "user_id", "ts_us")
    val got = graft.plans.AsOf.join(facts, versions,
        leftKey = "user_id", rightKey = "d_user",
        leftTime = "ts_us", rightTime = "valid_from_us",
        leftId = "event_id", rightId = "d_rid")
      .select("event_id", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(101L -> None, 102L -> Some("bronze"),
      103L -> Some("bronze"), 104L -> Some("gold")), got)
    // and the full query keeps the zero-join lowering
    val opt = EventQueries.defs.find(_.name == "pit_feature_join").get
      .fn(spark, dir).queryExecution.optimizedPlan
    val joins = opt.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, s"PIT join reintroduced a join:\n${opt.treeString}")
  }

  test("pit_feature_join: colliding version starts break deterministically by version") {
    // Two different-typed events at the SAME timestamp open adjacent
    // SCD2 runs whose valid_from_us COLLIDE. A constant-sentinel d_rid
    // would leave equal-(time, id) right rows unordered (engine picks
    // nondeterministically, the exact cross-engine compare flake the
    // r14 advice flagged); d_rid = Long.MinValue + version makes the
    // higher version win, matching the oracle's
    // `valid_from_us DESC, version DESC` rank.
    import spark.implicits._
    val versions = Seq(
      (7L, 1L, "view", 1000L), (7L, 2L, "cart", 1000L), // collision at 1000
      (7L, 3L, "view", 5000L))
      .toDF("d_user", "version", "tier", "valid_from_us")
      .withColumn("d_rid", org.apache.spark.sql.functions.lit(Long.MinValue)
        + org.apache.spark.sql.functions.col("version"))
    val facts = Seq(
      (201L, 7L, 1000L),  // on the collision instant -> version 2 (cart)
      (202L, 7L, 4999L),  // mid-interval after collision -> still cart
      (203L, 7L, 6000L))  // after version 3 -> view
      .toDF("event_id", "user_id", "ts_us")
    val got = graft.plans.AsOf.join(facts, versions,
        leftKey = "user_id", rightKey = "d_user",
        leftTime = "ts_us", rightTime = "valid_from_us",
        leftId = "event_id", rightId = "d_rid")
      .select("event_id", "version", "tier").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got == Map(201L -> ((2L, "cart")), 202L -> ((2L, "cart")),
      203L -> ((3L, "view"))), got)
  }

  test("SQL surface: asof_join table function equals the custom-plan API path") {
    // spark.sql users get the operator too — same node, same lowering
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val ev = graft.Tables.events(spark, dir)
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"))
      .createOrReplaceTempView("asof_purchases")
    ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_event_id"), col("user_id").as("c_user"),
        unix_micros(col("ts")).as("click_us"))
      .createOrReplaceTempView("asof_clicks")
    try {
      val viaSql = spark.sql(
        """SELECT event_id, user_id, purchase_us, click_event_id, click_us
          |FROM asof_join('asof_purchases', 'asof_clicks',
          |  'user_id', 'c_user', 'purchase_us', 'click_us',
          |  'event_id', 'click_event_id')""".stripMargin)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
      assert(viaSql == rows("asof_plan_node"),
        s"missing=${(rows("asof_plan_node") -- viaSql).take(3)} extra=${(viaSql -- rows("asof_plan_node")).take(3)}")
      // misuse errors are loud and near the call site
      val bad = intercept[Exception] {
        spark.sql("SELECT * FROM asof_join('asof_purchases', 'asof_clicks', " +
          "'no_such_col', 'c_user', 'purchase_us', 'click_us', " +
          "'event_id', 'click_event_id')").collect()
      }
      assert(bad.getMessage.contains("no_such_col"), bad.getMessage)
    } finally {
      spark.catalog.dropTempView("asof_purchases")
      spark.catalog.dropTempView("asof_clicks")
    }
  }

  test("incomparable cross-side time/id types fail with a clear message") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L)).toDF("lk", "lt", "lid")
    val r = Seq((1L, "not a time", 7L)).toDF("rk", "rt", "rid")
    val e = intercept[Exception] {
      graft.plans.AsOf.join(l, r, "lk", "rk", "lt", "rt", "lid", "rid").collect()
    }
    assert(e.getMessage.contains("mutually comparable"), e.getMessage)
    // numeric widening across the pair is fine (int vs long)
    val r2 = Seq((1, 5, 7)).toDF("rk", "rt", "rid")
    val ok = graft.plans.AsOf.join(l, r2, "lk", "rk", "lt", "rt", "lid", "rid").collect()
    assert(ok.length == 1 && ok.head.get(5) == 7)
  }

  test("forward direction equals the single-table forward window form, no join") {
    def fRows(name: String): Set[(Long, Long, Long, Option[Long], Option[Long], Option[Long])] =
      EventQueries.defs.find(_.name == name).get.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long]))).toSet
    val viaPlan = fRows("asof_plan_forward")
    val viaWindow = fRows("asof_forward")
    assert(viaPlan == viaWindow,
      s"missing=${(viaWindow -- viaPlan).take(3)} extra=${(viaPlan -- viaWindow).take(3)}")
    assert(viaPlan.exists(_._4.isDefined) && viaPlan.exists(_._4.isEmpty))
    val opt = EventQueries.defs.find(_.name == "asof_plan_forward").get
      .fn(spark, dir).queryExecution.optimizedPlan
    assert(opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, opt.treeString)
  }

  test("forward tie semantics: strictly-after excludes equal (time, id); null times never match") {
    import spark.implicits._
    val l = Seq((1L, 100L, 10L), (1L, 100L, 11L), (2L, 50L, 20L))
      .toDF("lk", "lt", "lid")
    val r = Seq((1L, java.lang.Long.valueOf(100L), 11L),
        (1L, java.lang.Long.valueOf(100L), 15L),
        (1L, java.lang.Long.valueOf(200L), 3L),
        (2L, null.asInstanceOf[java.lang.Long], 1L))
      .toDF("rk", "rt", "rid")
    val out = graft.plans.AsOf.join(l, r, "lk", "rk", "lt", "rt", "lid", "rid",
        forward = true)
      .collect().map(x => (x.getLong(0), x.getLong(2), Option(x.get(5)).map(_.asInstanceOf[Long])))
      .toSet
    // (1, lid=10): rights strictly after (100,10): (100,11),(100,15),(200,3)
    //   → earliest is (100,11)
    // (1, lid=11): (100,11) ties exactly → excluded; earliest is (100,15)
    // (2, lid=20): only right has NULL time → no match
    assert(out == Set((1L, 10L, Some(11L)), (1L, 11L, Some(15L)), (2L, 20L, None)), out)
  }

  test("null right times never match; strict (time, id) tie semantics hold") {
    import spark.implicits._
    val l = Seq((1L, 100L, 10L), (1L, 100L, 11L), (2L, 50L, 20L))
      .toDF("lk", "lt", "lid")
    // right rows: id 5 ties left (100, 10) exactly on time with a
    // SMALLER id → matches lid 10 and 11; id 99 ties (100, 11) on both
    // time and id ordering edge; null-time row must never match
    val r = Seq((1L, java.lang.Long.valueOf(100L), 5L),
        (1L, java.lang.Long.valueOf(100L), 11L),
        (2L, null.asInstanceOf[java.lang.Long], 1L))
      .toDF("rk", "rt", "rid")
    val out = graft.plans.AsOf.join(l, r, "lk", "rk", "lt", "rt", "lid", "rid")
      .collect().map(x => (x.getLong(0), x.getLong(2), Option(x.get(5)).map(_.asInstanceOf[Long])))
      .toSet
    // (lk=1, lid=10): rights at time 100 with rid<10 → rid 5 ✓ (rid 11 excluded)
    // (lk=1, lid=11): rid 5 and... rid 11 == lid 11 at equal time → strictly-before
    //   requires rid < lid → 11 excluded, latest is 5
    // (lk=2, lid=20): only right has NULL time → no match
    assert(out == Set((1L, 10L, Some(5L)), (1L, 11L, Some(5L)), (2L, 20L, None)), out)
  }

  test("NULL keys never match: right dropped, left emits NULL right columns") {
    import spark.implicits._
    // join/SQL semantics (and the DuckDB oracle's JOIN ON) treat NULL
    // keys as never equal; the window lowering must not let the NULL
    // partition pair them up
    val l = Seq((java.lang.Long.valueOf(1L), 100L, 10L),
        (null.asInstanceOf[java.lang.Long], 100L, 11L))
      .toDF("lk", "lt", "lid")
    val r = Seq((java.lang.Long.valueOf(1L), 50L, 5L),
        (null.asInstanceOf[java.lang.Long], 50L, 6L))
      .toDF("rk", "rt", "rid")
    val out = graft.plans.AsOf.join(l, r, "lk", "rk", "lt", "rt", "lid", "rid")
      .collect().map(x => (x.getLong(2), Option(x.get(5)).map(_.asInstanceOf[Long])))
      .toSet
    // lk=1 matches the rk=1 right; the NULL-key left row is KEPT but
    // matches nothing — not the NULL-key right row sorting before it
    assert(out == Set((10L, Some(5L)), (11L, None)), out)
    // forward direction shares the filter
    val fwd = graft.plans.AsOf.join(l, r, "lk", "rk", "lt", "rt", "lid", "rid",
        forward = true)
      .collect().map(x => (x.getLong(2), Option(x.get(5)).map(_.asInstanceOf[Long])))
      .toSet
    assert(fwd == Set((10L, None), (11L, None)), fwd)
  }

  test("NULL ids at tied times never match, either side, both directions") {
    import spark.implicits._
    // the predicate form is rid < lid (rid > lid forward): NULL on
    // EITHER side → NULL → no match at a tied time; earlier/later
    // times still match regardless of ids
    val l = Seq((1L, java.lang.Long.valueOf(100L), java.lang.Long.valueOf(10L)),
        (2L, java.lang.Long.valueOf(100L), null.asInstanceOf[java.lang.Long]))
      .toDF("lk", "lt", "lid")
    val r = Seq(
        (1L, 100L, null.asInstanceOf[java.lang.Long]), // tied time, NULL rid → no match
        (2L, 100L, java.lang.Long.valueOf(7L)),        // tied time, NULL lid → no match
        (2L, 40L, java.lang.Long.valueOf(8L)))         // strictly before → matches
      .toDF("rk", "rt", "rid")
    val back = graft.plans.AsOf.join(l, r, "lk", "rk", "lt", "rt", "lid", "rid")
      .collect().map(x => (x.getLong(0), Option(x.get(5)).map(_.asInstanceOf[Long])))
      .toSet
    assert(back == Set((1L, None), (2L, Some(8L))), back)
    val r2 = Seq(
        (1L, 100L, null.asInstanceOf[java.lang.Long]), // tied, NULL rid → no match
        (2L, 100L, java.lang.Long.valueOf(7L)),        // tied, NULL lid → no match
        (2L, 160L, java.lang.Long.valueOf(8L)))        // strictly after → matches
      .toDF("rk", "rt", "rid")
    val fwd = graft.plans.AsOf.join(l, r2, "lk", "rk", "lt", "rt", "lid", "rid",
        forward = true)
      .collect().map(x => (x.getLong(0), Option(x.get(5)).map(_.asInstanceOf[Long])))
      .toSet
    assert(fwd == Set((1L, None), (2L, Some(8L))), fwd)
  }

  test("randomized differential: merge lowering equals the brute-force predicate, both directions") {
    import spark.implicits._
    // 250×250 rows, fixed seed, NULLs sprinkled into every routing
    // column; each row carries a unique tag so results key without
    // relying on the (nullable) ordering id. The one underdetermined
    // corner — two NULL-id right rows tied on (key, time) have no
    // defined pick order — is excluded at generation (the id-uniqueness
    // contract, extended to the NULL stand-ins).
    val rnd = new scala.util.Random(42)
    def gen(n: Int, idBase: Long): Seq[(java.lang.Long, java.lang.Long, java.lang.Long, Long)] =
      (0 until n).map { i =>
        val k: java.lang.Long =
          if (rnd.nextInt(20) == 0) null else java.lang.Long.valueOf(rnd.nextInt(8).toLong)
        val t: java.lang.Long =
          if (rnd.nextInt(20) == 0) null else java.lang.Long.valueOf(rnd.nextInt(40).toLong)
        val id: java.lang.Long =
          if (rnd.nextInt(15) == 0) null else java.lang.Long.valueOf(idBase + i)
        (k, t, id, idBase + i)
      }
    val lRows = gen(250, 1000)
    val rRows = {
      val seen = scala.collection.mutable.Set.empty[(Option[Long], Option[Long])]
      gen(250, 5000).filter { case (k, t, id, _) =>
        id != null || seen.add((Option(k).map(Long.unbox), Option(t).map(Long.unbox)))
      }
    }
    val l = lRows.toDF("lk", "lt", "lid", "lrow")
    val r = rRows.toDF("rk", "rt", "rid", "rrow")
    for (forward <- Seq(false, true)) {
      val got = graft.plans.AsOf.join(l, r, "lk", "rk", "lt", "rt", "lid", "rid", forward)
        .select(col("lrow"), col("rrow")).collect()
        .map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long])).toMap
      def ob(x: java.lang.Long): Option[Long] = Option(x).map(Long.unbox)
      val expected = lRows.map { case (lk, lt, lid, lrow) =>
        val cands = rRows.filter { case (rk, rt, rid, _) =>
          (for { a <- ob(lk); b <- ob(rk); c <- ob(lt); d <- ob(rt) } yield
            a == b && (
              if (forward) d > c ||
                (d == c && (for { e <- ob(lid); f <- ob(rid) } yield f > e).getOrElse(false))
              else d < c ||
                (d == c && (for { e <- ob(lid); f <- ob(rid) } yield f < e).getOrElse(false))))
            .getOrElse(false)
        }
        // among candidates the pick is the frame boundary in (time, id)
        // order, a NULL id sorting toward the frame's far side (the
        // null-rank): backward = max(time, id-with-null-last), forward
        // = min(time, id-with-null-first)
        val pick =
          if (cands.isEmpty) None
          else if (forward) Some(cands.minBy { case (_, rt, rid, _) =>
            (Long.unbox(rt), ob(rid).getOrElse(Long.MinValue)) }._4)
          else Some(cands.maxBy { case (_, rt, rid, _) =>
            (Long.unbox(rt), ob(rid).getOrElse(Long.MaxValue)) }._4)
        lrow -> pick
      }.toMap
      val diff = (got.keySet ++ expected.keySet)
        .filter(k => got.get(k) != expected.get(k)).take(5)
        .map(k => s"lrow=$k got=${got.get(k)} want=${expected.get(k)}")
      assert(got == expected, s"forward=$forward diffs: ${diff.mkString("; ")}")
      // non-degenerate: matched, unmatched, and NULL-routed rows all exist
      assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
    }
  }

  test("incomparable cross-side KEY types fail with a clear message") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L)).toDF("lk", "lt", "lid")
    val r = Seq(("not a key", 5L, 7L)).toDF("rk", "rt", "rid")
    val e = intercept[Exception] {
      graft.plans.AsOf.join(l, r, "lk", "rk", "lt", "rt", "lid", "rid").collect()
    }
    assert(e.getMessage.contains("mutually comparable") &&
      e.getMessage.contains("key"), e.getMessage)
  }
}
