package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's measurement statistics: the published spread must
  * describe STEADY STATE (MAD — robust to bursts in up to half the
  * rounds), while the adaptive-extension trigger stays burst-SENSITIVE
  * (raw range). BENCH_r05 is the motivating recording: co-tenant
  * bursts in 2 of 7 rounds (bm25_search 10.3 s and 16.4 s against a
  * 1.44 s median) pinned the old trimmed-range noise at 6.18 even
  * though the medians were trustworthy.
  */
class BenchStatSpec extends AnyFunSuite {

  test("median is the middle sample; spread is 0 for identical runs") {
    val (m, sp) = Bench.stat(Seq(1.0, 1.0, 1.0))
    assert(m === 1.0)
    assert(sp === 0.0)
  }

  test("one burst in 3 rounds: median clean, MAD spread stays steady-state") {
    // the old 3-sample range was max-min = the burst itself
    val (m, sp) = Bench.stat(Seq(1.4, 1.5, 16.4))
    assert(m === 1.5)
    assert(math.abs(sp - 0.2) < 1e-9) // 2 × median(|{0.1, 0, 14.9}|)
    // …but the raw figure still sees it (this is what extends rounds)
    assert(math.abs(Bench.rawSpread(Seq(1.4, 1.5, 16.4)) - 15.0) < 1e-9)
  }

  test("BENCH_r05 shape: bursts in 2 of 7 rounds cannot masquerade as variance") {
    // bm25_search's actual r5 profile: 5 calm samples + 2 bursts. A
    // trimmed range (drop single min+max) still reports ~9 s; MAD
    // reports the calm cluster's width.
    val runs = Seq(1.40, 1.42, 1.44, 1.47, 1.52, 10.3, 16.4)
    val (m, sp) = Bench.stat(runs)
    assert(m === 1.47)
    assert(sp <= 0.2, s"spread $sp should describe the calm cluster")
    assert(sp / m <= 0.2)                     // published noise: calm
    assert(Bench.rawSpread(runs) / m > 2.0)   // raw noise: extension fires
  }

  test("genuine variance is still reported, not suppressed") {
    // samples uniformly spread (no burst cluster): MAD must NOT hide it
    val (m, sp) = Bench.stat(Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    assert(m === 3.0)
    assert(sp === 2.0) // 2 × median(|{2,1,0,1,2}|) = 2×1
  }

  test("failed runs (-1 sentinel) are excluded upstream; stat handles any ordering") {
    val (m1, _) = Bench.stat(Seq(3.0, 1.0, 2.0))
    val (m2, _) = Bench.stat(Seq(1.0, 2.0, 3.0))
    assert(m1 === m2)
  }

  test("targeted extension: a burst recording flags ONLY the affected query") {
    // r6 hit the 7-round cap re-timing ~100 calm queries because one
    // was bursty; the trigger is per-query, so only the contaminated
    // recording asks for more samples
    assert(Bench.burstContaminated(Seq(1.4, 1.5, 16.4)))   // bm25-style burst
    assert(!Bench.burstContaminated(Seq(1.4, 1.5, 1.6)))   // calm neighbour
    assert(!Bench.burstContaminated(Seq(0.30, 0.34, 0.37))) // small-median jitter < 2×
    assert(!Bench.burstContaminated(Seq(-1.0, 1.5, 1.6)))  // failed runs never extend
    assert(!Bench.burstContaminated(Nil))
  }

  test("extension recovery: one spike clears after a clean extra sample; two spikes keep extending") {
    // rawSpread is monotone as samples append, so the in-loop re-check
    // must use stillBursty — plain burstContaminated could never clear
    // a burst query and every burst would run to the round cap
    val oneSpike = Seq(1.4, 1.5, 16.4, 1.5)
    assert(Bench.burstContaminated(oneSpike))   // the naive re-check would extend forever
    assert(!Bench.stillBursty(oneSpike))        // recovery: worst sample forgiven
    val twoSpikes = Seq(1.4, 1.5, 16.4, 1.5, 15.9)
    assert(Bench.stillBursty(twoSpikes))        // genuinely unstable: keeps extending
    // the INITIAL trigger (3 base samples) still uses plain
    // burstContaminated — stillBursty only governs the in-loop re-check
    assert(Bench.burstContaminated(Seq(1.4, 1.5, 16.4)))
  }

  test("BENCH_r09 shape: median poisoned by 2-of-5 bursts keeps extending until clean") {
    // lm_perplexity_filter's actual r9 recording: the one-spike-
    // forgiven recovery rule released it after 5 rounds with a 5.9 s
    // published median against a ~2.3 s calm cluster
    val r9 = Seq(2.3, 13.8, 2.2, 34.4, 5.9)
    assert(Bench.medianPoisoned(r9), "2-of-5 bursts must flag the median")
    // synthetic burst-injection recovery: each extension round appends
    // an (almost surely) clean sample; the median walks back into the
    // calm cluster and the detector releases the query
    var ts = r9
    var extra = 0
    while (Bench.medianPoisoned(ts) && extra < 6) { // MaxRounds-BaseRounds cap
      ts = ts :+ 2.25 // a clean sample
      extra += 1
    }
    assert(extra <= 2, s"recovery should take ~2 clean rounds, took $extra")
    assert(math.abs(Bench.stat(ts)._1 - 2.3) < 0.1,
      s"recovered median ${Bench.stat(ts)._1} must sit in the calm cluster")
  }

  test("median-poisoning detector: one-sided checks that must stay quiet") {
    // one spike in 4 (already handled by stillBursty's forgiveness):
    // median untouched — not poisoned
    assert(!Bench.medianPoisoned(Seq(1.4, 1.5, 16.4, 1.5)))
    // sub-floor jitter on a 0.1 s-scale query: ratio trips but the
    // absolute floor holds — must not extend round after round
    assert(!Bench.medianPoisoned(Seq(0.10, 0.16, 0.20)))
    // calm recording
    assert(!Bench.medianPoisoned(Seq(1.4, 1.5, 1.6)))
    // failed runs never extend
    assert(!Bench.medianPoisoned(Seq(-1.0, 1.5, 1.6)))
    assert(!Bench.medianPoisoned(Nil))
    // 2-of-3 bursts: the raw trigger can't see it (spread/median ≈ 1)
    // but the best-half comparison can — this is the widened coverage
    assert(Bench.medianPoisoned(Seq(2.0, 14.0, 16.0)))
  }

  test("shuffle gate fires on an intentional regression and stays quiet otherwise") {
    val baseline = Map("big" -> (10L << 20), "small" -> (10L << 10), "gone" -> 5L)
    // +20% on a 10 MiB query: a real plan regression — fires
    val fired = Bench.shuffleRegressions(Map("big" -> (12L << 20)), baseline)
    assert(fired.size == 1 && fired.head.startsWith("big:"), fired)
    // +5% on the same query: inside tolerance — quiet
    assert(Bench.shuffleRegressions(Map("big" -> ((10L << 20) + (512L << 10))), baseline).isEmpty)
    // +100% on a 10 KiB query: relative jump but under the 64 KiB
    // absolute floor (few-KiB jitter can't flake the gate) — quiet
    assert(Bench.shuffleRegressions(Map("small" -> (20L << 10)), baseline).isEmpty)
    // a query not in the committed record (new this round) — quiet
    assert(Bench.shuffleRegressions(Map("brand_new" -> (1L << 30)), baseline).isEmpty)
    // shrinking is never a finding
    assert(Bench.shuffleRegressions(Map("big" -> (1L << 20)), baseline).isEmpty)
  }

  test("time gate: noise-aware band — fires on real creep, quiet on noisy recordings") {
    val base = Map(
      "slow_stable" -> (8.0, 0.2),   // calm 8 s query
      "noisy" -> (4.0, 1.5),         // co-tenant-noisy recording
      "tiny" -> (0.12, 0.02))
    // +50% on a calm query, far beyond 3x spread: a real regression
    val fired = Bench.timeRegressions(Map("slow_stable" -> (12.0, 0.3)), base)
    assert(fired.size == 1 && fired.head.startsWith("slow_stable:"), fired)
    // +26% but within 3x the noisy recording's spread (4.5 s band) — quiet
    assert(Bench.timeRegressions(Map("noisy" -> (5.1, 0.2)), base).isEmpty)
    // a CURRENT noisy recording also widens the band symmetrically
    assert(Bench.timeRegressions(Map("slow_stable" -> (10.2, 4.0)), base).isEmpty)
    // 2x on a 0.12 s query: relative jump but under the 0.3 s floor
    // (sub-second medians are noise-limited; the bytes gate owns them)
    assert(Bench.timeRegressions(Map("tiny" -> (0.25, 0.02)), base).isEmpty)
    // +24% on a calm query: inside the relative guard even though the
    // absolute jump clears the band — quiet
    assert(Bench.timeRegressions(Map("slow_stable" -> (9.9, 0.2)), base).isEmpty)
    // faster is never a finding; unknown queries are never findings
    assert(Bench.timeRegressions(Map("slow_stable" -> (4.0, 0.2)), base).isEmpty)
    assert(Bench.timeRegressions(Map("brand_new" -> (60.0, 0.1)), base).isEmpty)
    // failed sentinel (-1) on either side never fires
    assert(Bench.timeRegressions(Map("slow_stable" -> (-1.0, 0.0)), base).isEmpty)
  }

  test("board drift: median current/baseline ratio, unknown on thin overlap") {
    // a uniformly 1.3x-loaded window: every query drifts together
    val base = (1 to 30).map(i => s"q$i" -> (1.0, 0.1)).toMap
    val loaded = (1 to 30).map(i => s"q$i" -> (1.3, 0.1)).toMap
    assert(math.abs(Bench.boardDrift(loaded, base) - 1.3) < 1e-9)
    // one real regression does not move the board median
    val oneBad = loaded + ("q7" -> (5.0, 0.1))
    assert(math.abs(Bench.boardDrift(oneBad, base) - 1.3) < 1e-9)
    // a subset run (below BoardDriftMinQueries overlap) reports unknown
    val few = (1 to 5).map(i => s"q$i" -> (2.0, 0.1)).toMap
    assert(Bench.boardDrift(few, base) == -1.0)
    // failed sentinels and baseline-absent queries never contribute
    val withFailed = loaded + ("q1" -> (-1.0, 0.0)) + ("brand_new" -> (9.0, 0.1))
    assert(math.abs(Bench.boardDrift(withFailed, base) - 1.3) < 1e-9)
  }

  test("time gate drift-normalization: a loaded window fires nothing, a real regression still fires") {
    val base = Map("a" -> (8.0, 0.2), "b" -> (2.0, 0.1))
    // the r13 shape: board drifts 1.27x — a +40% query is WITHIN the
    // window's uniform slowdown band and must not fire...
    assert(Bench.timeRegressions(Map("a" -> (11.2, 0.3)), base, drift = 1.27).isEmpty)
    // ...but text_repetition's shape (4.2x against the same 1.27x
    // board = 3.3x normalized) STILL fires — the whole point
    val fired = Bench.timeRegressions(Map("a" -> (33.6, 0.4)), base, drift = 1.27)
    assert(fired.size == 1 && fired.head.contains("drift-normalized"), fired)
    // drift is clamped at 1 from below: a faster-than-baseline window
    // must not tighten the gate (0.5 drift would halve the effective
    // baseline and flag a perfectly flat query)
    assert(Bench.timeRegressions(Map("a" -> (8.0, 0.2)), base, drift = 0.5).isEmpty)
    // unknown drift (-1, subset run) gates un-normalized
    assert(Bench.timeRegressions(Map("a" -> (12.0, 0.3)), base, drift = -1.0).nonEmpty)
  }

  val shingleTrio = Set("dedup_winnowing", "dedup_winnowing_spans",
    "source_overlap", "dedup_ngram_jaccard")

  test("cohort drift: cohort median, min-3 overlap, blind to non-members") {
    val base = Map("dedup_winnowing" -> (1.76, 0.2),
      "dedup_winnowing_spans" -> (2.73, 0.13), "source_overlap" -> (4.27, 0.11),
      "other" -> (1.0, 0.1))
    // the r14/r15 selective-drift shape: the whole cohort reads ~1.4x
    val drifted = Map("dedup_winnowing" -> (2.46, 0.2),
      "dedup_winnowing_spans" -> (3.82, 0.13), "source_overlap" -> (5.98, 0.11),
      "other" -> (1.0, 0.1))
    assert(math.abs(Bench.cohortDrift(drifted, base, shingleTrio) - 1.4) < 0.01)
    // non-members never contribute, even when wildly drifted
    val noisyOther = drifted + ("other" -> (9.0, 0.1))
    assert(math.abs(Bench.cohortDrift(noisyOther, base, shingleTrio) - 1.4) < 0.01)
    // fewer than 3 cohort members present -> unknown (one regressed
    // query must not define its own normalizer)
    assert(Bench.cohortDrift(
      Map("dedup_winnowing" -> (2.46, 0.2)), base, shingleTrio) == -1.0)
  }

  test("time gate cohort-normalization: whole-cohort drift quiet, single-member regression fires") {
    val base = Map("dedup_winnowing" -> (1.76, 0.05),
      "dedup_winnowing_spans" -> (2.73, 0.05), "source_overlap" -> (4.27, 0.05),
      "plain" -> (2.0, 0.05))
    // whole cohort at 1.4x, board flat (selective drift): with the
    // cohort normalizer the trio is quiet...
    val drifted = Map("dedup_winnowing" -> (2.46, 0.05),
      "dedup_winnowing_spans" -> (3.82, 0.05), "source_overlap" -> (5.98, 0.05))
    def shingleOnly(cur: Map[String, (Double, Double)]) =
      Seq(shingleTrio -> Bench.cohortDrift(cur, base, shingleTrio))
    assert(Bench.timeRegressions(drifted, base, drift = 1.0,
      cohorts = shingleOnly(drifted)).isEmpty)
    // ...while the SAME 1.4x on a non-member still fires un-normalized
    val plainSlow = drifted + ("plain" -> (2.9, 0.05))
    val fired = Bench.timeRegressions(plainSlow, base, drift = 1.0,
      cohorts = shingleOnly(plainSlow))
    assert(fired.size == 1 && fired.head.startsWith("plain"), fired)
    // a CODE regression in one member (3x) against a calm cohort
    // median (the other two at 1.0) fires, cohort normalizer ~1
    val oneBad = Map("dedup_winnowing" -> (5.3, 0.05),
      "dedup_winnowing_spans" -> (2.73, 0.05), "source_overlap" -> (4.27, 0.05))
    val firedBad = Bench.timeRegressions(oneBad, base, drift = 1.0,
      cohorts = shingleOnly(oneBad))
    assert(firedBad.size == 1 && firedBad.head.startsWith("dedup_winnowing:"),
      firedBad)
    // firing text says which normalizer applied when cohort > board
    val mixed = Bench.timeRegressions(
      Map("dedup_winnowing" -> (12.0, 0.05), "dedup_winnowing_spans" -> (4.1, 0.05),
        "source_overlap" -> (6.4, 0.05)), base, drift = 1.0,
      cohorts = Seq(shingleTrio -> 1.5))
    assert(mixed.size == 1 && mixed.head.contains("cohort-normalized"), mixed)
  }

  test("sustained-CPU class: derived from committed shape, floors enforced") {
    // the class replaces the r15/r16 hand cohorts: membership = wall
    // median >= 1 s AND effective cores >= 8, both from COMMITTED
    // records (a regression can't reclassify itself out of its gate)
    val time = Map(
      "lsh_like" -> (7.4, 0.1),     // long + parallel -> member
      "repetition_like" -> (0.41, 0.05), // fast codegen pass -> wall floor excludes
      "drain_like" -> (6.0, 0.2),   // long but 1-2 effective cores -> excluded
      "agg_like" -> (0.3, 0.02),    // sub-second -> excluded
      "no_cpu_row" -> (5.0, 0.1))   // absent from cpu baseline -> excluded
    val cpu = Map(
      "lsh_like" -> (180.0, 8.0),       // 22.5 effective cores
      "repetition_like" -> (12.0, 0.5), // 24 cores but sub-second wall
      "drain_like" -> (9.0, 6.0),       // 1.5 cores
      "agg_like" -> (6.0, 0.3))
    assert(Bench.sustainedCpuClass(time, cpu) === Set("lsh_like"))
    // degenerate cpu rows (wall 0, failed sentinel) never qualify
    assert(Bench.sustainedCpuClass(
      Map("z" -> (5.0, 0.1)), Map("z" -> (10.0, 0.0))).isEmpty)
    assert(Bench.sustainedCpuClass(
      Map("z" -> (5.0, 0.1)), Map("z" -> (-1.0, -1.0))).isEmpty)
  }

  test("sustained-CPU class on the COMMITTED baselines: known drifters in, known calm out") {
    // loads the real bench/*.tsv records — the data-driven derivation
    // the r16 verdict asked for: every query the five environment A/Bs
    // flagged lands in the class by its own measured shape, the known
    // non-co-drifters stay out
    def load(p: String): Map[String, (Double, Double)] =
      scala.io.Source.fromFile(p, "UTF-8").getLines()
        .filterNot(_.startsWith("#")).map(_.split('\t'))
        .collect { case a if a.length >= 3 =>
          a(0) -> (a(1).toDouble, a(2).toDouble) }.toMap
    val time = load("bench/time_baseline.tsv")
    val cpu = load("bench/cpu_baseline.tsv")
    val cls = Bench.sustainedCpuClass(time, cpu)
    // the five A/B-settled drift firings (r11-r17 triage log)
    for (q <- Seq("dedup_lsh_eval", "dedup_minhash_lsh", "dedup_semantic",
        "dedup_winnowing", "dedup_winnowing_spans", "source_overlap",
        "dedup_ngram_jaccard"))
      assert(cls.contains(q), s"$q must be in the sustained-CPU class, got: $cls")
    // known non-co-drifters / sub-second shapes stay out
    for (q <- Seq("text_repetition", "q1_agg", "join_inner", "limit_offset"))
      assert(!cls.contains(q), s"$q must NOT be in the sustained-CPU class")
    // the class is big enough for a robust median, small enough to be
    // selective (not the whole board)
    assert(cls.size >= 10 && cls.size * 2 < time.size,
      s"class size ${cls.size} of ${time.size}")
    // a lone 3x regression inside the derived class still fires when
    // the rest of the class holds the median at ~1 (synthetic check on
    // the real membership)
    val calm = time.map { case (q, (m, _)) => q -> (m, 0.05) }
    val bad = calm + ("dedup_lsh_eval" -> (calm("dedup_lsh_eval")._1 * 3, 0.05))
    val cd = Bench.cohortDrift(bad, calm, cls)
    val fired = Bench.timeRegressions(bad, calm, drift = 1.0,
      cohorts = Seq(cls -> cd))
    assert(fired.size == 1 && fired.head.startsWith("dedup_lsh_eval:"), fired)
  }

  test("cohort-drift warning: fires above the bound, silent below, unknown drift never warns") {
    assert(Bench.cohortDriftWarnings(Seq("shingle" -> 1.52, "minhash" -> 1.42)).isEmpty)
    val w = Bench.cohortDriftWarnings(Seq("shingle" -> 1.75, "minhash" -> 1.42))
    assert(w.size == 1 && w.head.contains("shingle") && w.head.contains("A/B"), w)
    // -1 = unknown (subset run): not a warning
    assert(Bench.cohortDriftWarnings(Seq("shingle" -> -1.0, "minhash" -> -1.0)).isEmpty)
  }

  test("global wall-clock budget: r12's rc-124 shape stops extending instead of overrunning") {
    // BENCH_r12: the extension loop had per-query round caps but no
    // clock, so a degraded window ran it into the driver's kill timer
    // (rc 124, parsed:null). budgetAllows is the guard: 95% of the
    // budget is spendable on measurement, the rest is reserved for
    // JSON assembly + spark.stop() + the final println.
    assert(Bench.budgetAllows(elapsedSec = 100, projectedSec = 100, budgetSec = 1500))
    // exactly at 95%: still allowed (<=)
    assert(Bench.budgetAllows(1325, 100, 1500))
    // one second past the reserve line: refused
    assert(!Bench.budgetAllows(1326, 100, 1500))
    // the r12 shape: 3 bursty queries ~ 26 s/round projected, but the
    // clock already at 97% of budget — the round must NOT start
    assert(!Bench.budgetAllows(1455, 26, 1500))
    // a fresh run always affords its first round
    assert(Bench.budgetAllows(0, 300, 1500))
  }

  test("environment-evidence probes return sane values on Linux") {
    // the bench JSONs carry these so machine drift is separable from
    // code regressions without a re-run; on this CI image all three
    // /proc files exist
    assert(Bench.loadavg1() >= 0.0)
    val (steal, total) = Bench.cpuJiffies()
    assert(total > 0 && steal >= 0 && steal <= total)
    // PSI may legitimately be absent (-1) on older kernels; when
    // present it is a percentage
    val psi = Bench.cpuPsi60()
    assert(psi == -1.0 || (psi >= 0.0 && psi <= 100.0), psi.toString)
  }
}
