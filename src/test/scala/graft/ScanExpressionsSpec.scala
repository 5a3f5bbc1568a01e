package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ScanExpressions._

/** Pins the r17 native scan expressions against the interpreted
  * built-in chains they replaced. The DuckDB oracles encode the OLD
  * composed semantics (regex tokenization, list-comprehension
  * shingles, the recursive-CTE BPE fold), so value parity here IS
  * oracle correctness for every consumer — the shingle/LSH dedup
  * stack, vocab_top_p's bigrams, and the BPE trainer.
  */
class ScanExpressionsSpec extends SparkSuite {

  // adversarial corpus: unicode (multi-byte chars ADJACENT to token
  // bytes — the byte-scanner's risk surface), empties, separators-only,
  // digits/letters boundaries, long runs, nulls
  private val texts = Seq(
    "", " ", "a", "A", "the Fast KEY 42", "42a7b",
    "café latte", "naïve café7x", "中文a处理9理", "emoji😀x9tail",
    "Ünïcödé ÉDGE", "ß sharp", "İstanbul TİTLE", // Turkish dotted İ
    "tab\tsep\nnewline", "punct,.;!?-end", "a-b_c.d",
    "0123456789abcdefghijklmnopqrstuvwxyz" * 8,
    "x " * 100, " leading", "trailing ", "double  space", null)

  private def oldTokens(text: org.apache.spark.sql.Column) =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  private def oldShingles(toks: org.apache.spark.sql.Column, n: Int) =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  test("asciiTokens equals regexp_extract_all(lower, '[a-z0-9]+') on adversarial inputs") {
    import spark.implicits._
    val rows = texts.toDF("t")
      .select(oldTokens(col("t")).as("o"), asciiTokens(lower(col("t"))).as("n"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null drift on '$t'")
      if (!r.isNullAt(0))
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"'$t': old=${r.getSeq[String](0)} new=${r.getSeq[String](1)}")
    }
  }

  test("shingles (via TextFunctions) equals the transform/slice chain for n=2,3,5") {
    import spark.implicits._
    for (n <- Seq(2, 3, 5)) {
      val rows = texts.toDF("t")
        .select(oldShingles(oldTokens(col("t")), n).as("o"),
          graft.functions.TextFunctions.shingles(oldTokens(col("t")), n).as("n"))
        .collect()
      rows.foreach { r =>
        // old chain maps NULL token arrays to [] — the coalesce wrapper
        // must preserve that
        assert(!r.isNullAt(1), "native shingles returned NULL")
        val o = if (r.isNullAt(0)) Seq.empty[String] else r.getSeq[String](0)
        assert(o == r.getSeq[String](1), s"n=$n: old=$o new=${r.getSeq[String](1)}")
      }
    }
  }

  test("symPairs equals transform-over-split pairs on degenerate separator layouts") {
    import spark.implicits._
    val syms = Seq(
      "", " ", "  ", "a", "a b", "a b c", "a  b", " a", "a ", " a b ",
      "q w e r t y", "ab cd", "x x x x x", "é ü ß", "a b b a", null)
    val sy = split(col("s"), " ")
    val oldPairs = when(size(sy) >= 2,
      transform(sequence(lit(1), size(sy) - 1),
        i => concat(element_at(sy, i), lit(" "), element_at(sy, i + 1))))
      .otherwise(array().cast("array<string>"))
    val rows = syms.toDF("s")
      .select(oldPairs.as("o"), symPairs(col("s")).as("n"))
      .collect()
    rows.zip(syms).foreach { case (r, s) =>
      if (s == null) assert(r.isNullAt(1))
      else {
        val o = if (r.isNullAt(0)) Seq.empty[String] else r.getSeq[String](0)
        assert(o == r.getSeq[String](1),
          s"'$s': old=$o new=${r.getSeq[String](1)}")
      }
    }
  }

  test("bpeMerge equals the regex aggregate fold on crafted symbol strings") {
    import spark.implicits._
    def oldFold(syms: org.apache.spark.sql.Column, a: String, b: String) = {
      val sy = split(syms, " ")
      aggregate(
        slice(sy, lit(2), greatest(size(sy) - 1, lit(0))),
        element_at(sy, 1),
        (acc, x) => when(
          regexp_extract(acc, "[^ ]+$", 0) === lit(a) && x === lit(b),
          concat(regexp_replace(acc, "[^ ]+$", ""), lit(a + b)))
          .otherwise(concat(acc, lit(" "), x)))
    }
    val cases = Seq(
      ("a a a a a", "a", "a"), ("a b a b", "a", "b"), ("x a b y", "a", "b"),
      ("a b b", "a", "b"), ("q", "a", "b"), ("", "a", "b"),
      ("ab c ab c ab", "ab", "c"), ("t h e t h e", "t", "h"),
      ("é ü é ü", "é", "ü"), ("aa a aa a", "aa", "a"),
      ("b a b a b", "b", "a"), ("a b a b a b a b", "ab", "ab"))
    cases.foreach { case (in, a, b) =>
      val r = Seq(in).toDF("s")
        .select(oldFold(col("s"), a, b).as("o"), bpeMerge(col("s"), a, b).as("n"))
        .head()
      assert(r.getString(0) == r.getString(1),
        s"merge($a,$b) on '$in': old='${r.getString(0)}' new='${r.getString(1)}'")
    }
  }

  test("gramHashes equals md5(substr) windows (hex form) on unicode and short texts") {
    import spark.implicits._
    for (k <- Seq(3, 24)) {
      val oldGrams = transform(
        when(length(col("t")) >= k, sequence(lit(1), length(col("t")) - k + 1))
          .otherwise(array().cast("array<int>")),
        i => md5(col("t").substr(i, lit(k))))
      val rows = texts.toDF("t")
        .select(oldGrams.as("o"),
          transform(gramHashes(col("t"), k), h => lower(hex(h))).as("n"))
        .collect()
      rows.zip(texts).foreach { case (r, t) =>
        if (t == null) assert(r.isNullAt(1))
        else assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"k=$k '$t': old=${r.getSeq[String](0)} new=${r.getSeq[String](1)}")
      }
    }
  }

  test("winnowSelect equals the md5-gram array_min window chain, both variants") {
    import spark.implicits._
    // corpus-like and crafted: repeated regions (equal digests inside a
    // window — the tie-break surface), multi-byte chars, short docs
    val docs = Seq(
      "", "short", "x" * 40, ("ab" * 30) + "tail piece here",
      "the quick brown fox jumps over the lazy dog and then some more text",
      ("samesamesame" * 6) + " unique suffix 123456", "é" * 50,
      "abcdefghijklmnopqrstuvwxyz0123456789" * 3)
    for ((k, w) <- Seq((5, 4), (24, 8))) {
      val oldGrams = transform(
        when(length(col("t")) >= k, sequence(lit(1), length(col("t")) - k + 1))
          .otherwise(array().cast("array<int>")),
        i => md5(col("t").substr(i, lit(k))))
      // value-only variant
      val oldSel = array_distinct(transform(
        when(size(col("gr")) >= w, sequence(lit(0), size(col("gr")) - w))
          .otherwise(array().cast("array<int>")),
        j => array_min(slice(col("gr"), j + lit(1), lit(w)))))
      val r1 = docs.toDF("t").select(col("t"), oldGrams.as("gr"))
        .select(sort_array(oldSel).as("o"),
          sort_array(transform(winnowSelect(col("t"), k, w, withPos = false),
            h => lower(hex(h)))).as("n"))
        .collect()
      r1.zip(docs).foreach { case (r, t) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"k=$k w=$w values '$t': old=${r.getSeq[String](0)} new=${r.getSeq[String](1)}")
      }
      // positional variant: old chain minimizes md5hex || lpad(pos)
      val oldGramsPos = transform(
        when(length(col("t")) >= k, sequence(lit(1), length(col("t")) - k + 1))
          .otherwise(array().cast("array<int>")),
        i => concat(md5(col("t").substr(i, lit(k))), lpad(i.cast("string"), 10, "0")))
      val oldSelPos = array_distinct(transform(
        when(size(col("gr")) >= w, sequence(lit(0), size(col("gr")) - w))
          .otherwise(array().cast("array<int>")),
        j => array_min(slice(col("gr"), j + lit(1), lit(w)))))
      val r2 = docs.toDF("t").select(col("t"), oldGramsPos.as("gr"))
        .select(sort_array(oldSelPos).as("o"),
          sort_array(transform(winnowSelect(col("t"), k, w, withPos = true),
            p => concat(lower(hex(p.getField("h"))),
              lpad(p.getField("pos").cast("string"), 10, "0")))).as("n"))
        .collect()
      r2.zip(docs).foreach { case (r, t) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"k=$k w=$w pos '$t': old=${r.getSeq[String](0)} new=${r.getSeq[String](1)}")
      }
    }
  }

  test("scan expressions participate in whole-stage codegen") {
    val df = spark.read.parquet(sf("documents"))
      .select(explode(graft.functions.TextFunctions.shingles(
        graft.functions.TextFunctions.tokens(col("text")))).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_ascii_tokens"), plan)
    assert(plan.contains("graft_shingles"), plan)
    // the projection feeding the generator runs compiled
    assert(plan.linesIterator.exists(l => l.trim.startsWith("*(")), plan)
    assert(df.count() > 0)
  }
}
