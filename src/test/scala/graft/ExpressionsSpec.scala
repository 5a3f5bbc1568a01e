package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Pins the native PortableHashExpr against its contracts: value
  * parity with the composed conv/substring/md5 chain it replaced (the
  * DuckDB oracles encode that chain, so parity here IS oracle
  * correctness for every hash consumer), parity with the JVM twin, and
  * whole-stage-codegen participation.
  */
class ExpressionsSpec extends SparkSuite {

  private val inputs = Seq(
    "", "a", "the fast key", "42", "user7",
    "café", "café", // composed vs decomposed accents (distinct inputs!)
    "中文处理", "emoji 😀 tail",
    "line\nbreak\ttab", "sp  aces   ", "0" * 200)

  test("native hash equals the composed md5 chain on unicode inputs, all salts") {
    import spark.implicits._
    for (salt <- Seq(0, 1, 13, 21, 37, 41, 43, 47, 71, 97, 101, 103)) {
      val rows = inputs.toDF("v")
        .select(
          TextFunctions.portableHash(col("v"), salt).as("native"),
          conv(substring(md5(concat(lit(s"$salt:"), col("v"))), 1, 15), 16, 10)
            .cast("long").as("composed"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"salt=$salt native=${r.getLong(0)} composed=${r.getLong(1)}"))
    }
  }

  test("native hash equals the JVM twin") {
    import spark.implicits._
    val fromCol = inputs.toDF("v")
      .select(TextFunctions.portableHash(col("v"), 71))
      .collect().map(_.getLong(0)).toSeq
    assert(fromCol == inputs.map(TextFunctions.portableHashJvm(_, 71)))
  }

  test("native hash participates in whole-stage codegen") {
    // a real parquet scan: local relations constant-fold the projection
    // away (ConvertToLocalRelation), hiding the codegen question
    val df = spark.read.parquet(sf("documents"))
      .select(TextFunctions.portableHash(col("text"), 71).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix is the executed plan's whole-stage-codegen marker
    assert(plan.linesIterator.next().startsWith("*("), plan)
    assert(df.queryExecution.analyzed.toString.contains("graft_phash"),
      df.queryExecution.analyzed.toString)
    // and it actually runs compiled (collect exercises the generated path)
    assert(df.collect().length == 500)
  }

  test("graft_repetition_stats equals a driver brute force and participates in codegen") {
    import spark.implicits._
    import graft.functions.TextFunctions.{repetitionStats, tokens}
    // brute force over the token list: bigram/trigram totals, max
    // bigram multiplicity, distinct trigram count
    def brute(toks: Seq[String]): (Long, Long, Long, Long) = {
      val bg = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val tg = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      (bg.size.toLong,
        if (bg.isEmpty) 0L else bg.groupBy(identity).values.map(_.size).max.toLong,
        tg.size.toLong, tg.distinct.size.toLong)
    }
    val texts = Seq(
      "a b a b a b c",         // repeated bigrams, duplicate trigrams
      "x",                     // below bigram threshold
      "",                      // no tokens at all
      "one two three",         // exactly one trigram
      "t t t t t t t t")       // maximal repetition
    val df = texts.toDF("text")
      .select(col("text"), repetitionStats(tokens(col("text"))).as("st"))
    val got = df.select(col("text"), col("st.n_bg"), col("st.top_bg"),
        col("st.n_tg"), col("st.n_dist_tg"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    texts.foreach { t =>
      val toks = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
      assert(got(t) == brute(toks), s"text '$t': ${got(t)} vs ${brute(toks)}")
    }
    // whole-stage codegen: over a real scan (a literal local relation
    // constant-folds the whole projection away), the projection
    // carrying the expression compiles — the `*(n)` marker
    val dfScan = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(repetitionStats(tokens(col("text"))).as("st"))
    val plan = dfScan.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("), plan)
    assert(dfScan.collect().nonEmpty)
  }

  test("graft_dot accepts float and double arrays, per side, with identical folds") {
    import spark.implicits._
    import graft.functions.TextFunctions.dotFast
    val df = Seq((Seq(1.5f, -2.25f, 0.125f), Seq(4.0f, 0.5f, -8.0f)))
      .toDF("a", "b")
      .withColumn("ad", col("a").cast("array<double>"))
      .withColumn("bd", col("b").cast("array<double>"))
    val r = df.select(
      dotFast(col("a"), col("b")).as("ff"),
      dotFast(col("ad"), col("bd")).as("dd"),
      dotFast(col("a"), col("bd")).as("fd"),
      dotFast(col("ad"), col("b")).as("df")).head()
    val expect = 1.5 * 4.0 + (-2.25) * 0.5 + 0.125 * (-8.0)
    Seq(0, 1, 2, 3).foreach(i => assert(r.getDouble(i) == expect, s"col $i"))
    // length mismatch still yields NULL on the double path
    val m = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("x", "y")
      .select(dotFast(col("x"), col("y"))).head()
    assert(m.isNullAt(0))
  }
}
