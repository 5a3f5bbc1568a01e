package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import org.apache.spark.sql.graft.ScanExpressions._

/** Micro-benchmark + equivalence harness for the r17 expression-level
  * optimizations: times named sub-pipelines of the hot text/dedup paths
  * (old interpreted chain vs native scan expression) through the noop
  * sink, and counts value MISMATCHES between the two forms over the
  * real corpus (must print 0 — the native expressions are only
  * shippable as drop-in replacements if they are value-identical on
  * every row they will ever see, plus the property tests' adversarial
  * inputs). Usage: runMain graft.Micro [sfDir] [reps] [filter]
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val only = args.lift(2).getOrElse("")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = graft.queries.ProfilingQueries.widened(
      spark, Tables(spark, sfDir, "documents"))

    // the OLD interpreted forms, inlined here so they survive the
    // TextFunctions rewiring (this tool must keep A/B-ing old vs new)
    def oldTokens(text: org.apache.spark.sql.Column) =
      regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    def oldShingles(toks: org.apache.spark.sql.Column, n: Int) =
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>"))

    val pipelines: Seq[(String, () => DataFrame)] = Seq(
      "scan" -> (() => docs),
      "tok_old" -> (() => docs.select(col("doc_id"), oldTokens(col("text")).as("t"))),
      "tok_new" -> (() => docs.select(col("doc_id"), asciiTokens(lower(col("text"))).as("t"))),
      "shing_old" -> (() => docs.select(col("doc_id"),
        explode(oldShingles(oldTokens(col("text")), 3)).as("s"))),
      "shing_new" -> (() => docs.select(col("doc_id"),
        explode(shinglesNative(asciiTokens(lower(col("text"))), 3)).as("s"))),
      "shingdist_old" -> (() => docs.select(col("doc_id"),
        explode(oldShingles(oldTokens(col("text")), 3)).as("s")).distinct()),
      "shingdist_new" -> (() => docs.select(col("doc_id"),
        explode(shinglesNative(asciiTokens(lower(col("text"))), 3)).as("s")).distinct()),
      "phash" -> (() => docs.select(col("doc_id"),
        explode(shinglesNative(asciiTokens(lower(col("text"))), 3)).as("s"))
        .distinct()
        .select(col("doc_id"), portableHash(col("s"), 0).as("h0"),
          portableHash(col("s"), 1).as("h1"))),
      // staged dedup pipeline (each stage includes everything below it)
      "dd_shingleset" -> (() => graft.queries.DedupQueries.shingleSet(
        spark, sfDir, Some(graft.queries.DedupQueries.DriverMaxDfFrac))),
      "dd_bands" -> (() => graft.queries.DedupQueries.minhashBands(
        graft.queries.DedupQueries.shingleSet(
          spark, sfDir, Some(graft.queries.DedupQueries.DriverMaxDfFrac)))),
      "dd_lshcand" -> (() => graft.queries.DedupQueries.lshCandidates(
        graft.queries.DedupQueries.shingleSet(
          spark, sfDir, Some(graft.queries.DedupQueries.DriverMaxDfFrac)))),
      "dd_verify" -> (() => {
        val sh = graft.queries.DedupQueries.shingleSet(
          spark, sfDir, Some(graft.queries.DedupQueries.DriverMaxDfFrac))
        graft.queries.DedupQueries.jaccardPairs(sh,
          Some(graft.queries.DedupQueries.lshCandidates(sh)))
          .filter(col("jaccard") >= 0.8)
      }),
      "dd_prefixcand" -> (() => {
        val sh = graft.queries.DedupQueries.shingleSet(
          spark, sfDir, Some(graft.queries.DedupQueries.DriverMaxDfFrac))
        graft.queries.DedupQueries.prefixCandidates(sh,
          graft.queries.DedupQueries.SetSimTau)
      }),
      // VARIANT: df-cap without persisting the raw shingle frame — the
      // tokenize chain is cheap post-r17, so re-evaluating it 3x may
      // beat one columnar cache write + two cache reads
      "dd_shingleset_nocache" -> (() => {
        import graft.queries.DedupQueries.{DriverMaxDfFrac, MinDfFloor}
        val sh = docs
          .select(col("doc_id"), explode(shinglesNative(
            asciiTokens(lower(col("text"))), 3)).as("s"))
          .distinct()
        val thr = sh.agg(countDistinct(col("doc_id")).as("nd"))
          .select(greatest(ceil(col("nd") * DriverMaxDfFrac), lit(MinDfFloor))
            .cast("long").as("thr"))
        val hot = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(thr))
          .filter(col("df") > col("thr"))
          .select(col("s"))
        val capped = sh.join(hot, Seq("s"), "left_anti").persist()
        capped.count()
        capped
      })
    )

    // BPE training attribution: total + per-round walls (the supersteps
    // are invisible to Explain — training runs at query construction).
    // Variants probe the per-round FIXED cost: AQE's per-stage driver
    // re-planning, and the 32-reduce-partition shuffle of a tiny agg.
    def bpeOnce(tag: String): Unit = {
      var last = System.nanoTime()
      val roundSec = scala.collection.mutable.ArrayBuffer.empty[Double]
      val t0 = System.nanoTime()
      graft.queries.TextQueries.bpeTrain(spark, sfDir, applyLast = false,
        onRound = (_, _) => {
          val now = System.nanoTime()
          roundSec += (now - last) / 1e9
          last = now
        })
      val tot = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val rs = roundSec.toSeq.sorted
      println(f"[micro] bpe_train[$tag] total $tot%.3f s, ${roundSec.size} rounds, " +
        f"round median ${rs(rs.size / 2)}%.3f s, max ${rs.last}%.3f s, " +
        f"first5 ${roundSec.take(5).map(t => f"$t%.3f").mkString(" ")}")
    }
    if (only.isEmpty || only == "bpe") {
      // NOTE (r18, advisor's ask): bpeTrain now SELF-TUNES the round
      // loop — it overrides shuffle.partitions and disables AQE inside
      // the loop and restores the session values after — so the old
      // noaqe/noaqe_p4/aqe_p4 conf variants no longer measured what
      // their names claimed (they only affected the pre-loop vocab
      // build). Dropped; base vs warm remains the useful signal.
      bpeOnce("warm") // first run absorbs JVM/codegen warmup
      bpeOnce("base")
    }

    val checks: Seq[(String, () => Long)] = Seq(
      "tokens_mismatch" -> (() => docs
        .select(oldTokens(col("text")).as("o"),
          asciiTokens(lower(col("text"))).as("n"))
        .filter(not(col("o") <=> col("n"))).count()),
      "shingles_mismatch" -> (() => docs
        .select(oldShingles(oldTokens(col("text")), 3).as("o"),
          shinglesNative(oldTokens(col("text")), 3).as("n"))
        .filter(not(col("o") <=> col("n"))).count()),
      "bigrams_mismatch" -> (() => docs
        .select(oldShingles(oldTokens(col("text")), 2).as("o"),
          shinglesNative(oldTokens(col("text")), 2).as("n"))
        .filter(not(col("o") <=> col("n"))).count()),
      // BPE frames: syms strings, old transform-pairs vs SymPairsExpr
      "sympairs_mismatch" -> (() => {
        val sy = split(col("syms"), " ")
        val oldPairs = when(size(sy) >= 2,
          transform(sequence(lit(1), size(sy) - 1),
            i => concat(element_at(sy, i), lit(" "), element_at(sy, i + 1))))
          .otherwise(array().cast("array<string>"))
        docs.select(trim(regexp_replace(
            concat_ws(" ", oldTokens(col("text"))), "(.)", "$1 ")).as("syms"))
          .select(oldPairs.as("o"), symPairs(col("syms")).as("n"))
          .filter(not(col("o") <=> col("n"))).count()
      })
    )

    val doChecks = only.isEmpty || only == "checks"
    if (doChecks) checks.foreach { case (name, f) =>
      println(f"[micro] CHECK $name = ${f()}")
    }

    pipelines.filter(p => only.isEmpty || p._1.contains(only))
      .foreach { case (name, f) =>
        val times = (0 to reps).map { r =>
          val t0 = System.nanoTime()
          f().write.format("noop").mode("overwrite").save()
          val t = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          t
        }.drop(1) // warmup
        println(f"[micro] $name%-16s median ${times.sorted.apply(times.size / 2)}%7.3f s  runs ${times.map(t => f"$t%.3f").mkString(" ")}")
      }
    spark.stop()
  }
}
