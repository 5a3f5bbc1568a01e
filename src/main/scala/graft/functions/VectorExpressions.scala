/* Lives in an org.apache.spark.sql subpackage on purpose: Catalyst's
 * expression-authoring surface (AbstractDataType, ExpressionUtils) is
 * private[sql], and the established pattern for Spark extension
 * libraries that ship native expressions is to compile into the sql
 * namespace. Only this file does so; the engine's public API re-exports
 * it from graft.functions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, StringType, TypeCollection}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the embedding hot path.
  *
  * Preference order for scalar compute (per the engine's design rules):
  * built-in codegen'd functions > custom native `Expression` > Scala UDF
  * > interpreted higher-order functions. The dot product over
  * `array<float>` has no built-in: `aggregate`/`zip_with` are
  * interpreted per element, and a Scala UDF pays Seq[Float] conversion
  * (boxing ~2·dim objects per call — GC-bound at millions of pairs).
  * This expression participates in whole-stage codegen and reads the
  * float array out of Tungsten's `ArrayData` directly: zero allocation
  * per row.
  *
  * Semantics are the strict left fold in double shared by every cosine
  * path in this engine (see `graft.functions.TextFunctions.dot`) —
  * bit-identical to the DuckDB oracle's `list_reduce` fold.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // float OR double element arrays, independently per side: the
  // testdata/ingest layer has already shipped one physical-type drift
  // (events.ts, round 9), and a regenerated float64 embedding column
  // must not redline every similarity query. Parity is exact either
  // way — the fold accumulates in double, so a float input is widened
  // per element (as before) and a double input is consumed natively,
  // both matching the oracle's CAST(x AS DOUBLE) fold bit-for-bit.
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
      TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elemDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  // mismatched-length arrays yield NULL even when both inputs are
  // non-null (see below), so the expression is nullable regardless of
  // its children
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // length mismatch → NULL, matching the interpreted twin
    // (zip_with pads with null and the fold propagates it) and the
    // DuckDB oracle (out-of-range list index yields NULL): a malformed
    // embedding must not produce a silently truncated dot product
    if (n != y.numElements()) return null
    val ld = elemDouble(left)
    val rd = elemDouble(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (ld) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rd) y.getDouble(i) else y.getFloat(i).toDouble
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      // element accessor resolved at CODEGEN time per side — the loop
      // body stays branch-free
      val xv = if (elemDouble(left)) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      val yv = if (elemDouble(right)) s"$b.getDouble($i)" else s"(double) $b.getFloat($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $xv * $yv;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Native Unicode NFC normalization — the canonicalization step a text
  * dedup pipeline must run BEFORE hashing (the composed "é" U+00E9 and
  * the decomposed "e"+U+0301 render identically but hash differently;
  * without NFC, exact dedup silently misses such pairs). No Spark
  * built-in exists; a Scala UDF would pay String boxing per row. The
  * static helper takes the zero-copy fast path (`isNormalized` on the
  * cheap ASCII-dominant case allocates nothing and returns the input
  * UTF8String as-is) and only materializes a java.lang.String for rows
  * that actually need recomposition. DuckDB twin: `nfc_normalize` —
  * both implement Unicode NFC, so oracle parity holds by spec.
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalizeExpr.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.NfcNormalizeExpr.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Static so generated code can call it without capturing `this`. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Native portable hash — the engine's cross-engine md5-derived 60-bit
  * hash (`graft.functions.TextFunctions.portableHash`), computed
  * without the composed chain's intermediate materializations. The
  * composed form (`conv(substring(md5(concat(...)), 1, 15), 16, 10)`)
  * builds a 32-char hex STRING per row, substrings it, and re-parses
  * the digits; this expression digests the salt prefix + value bytes
  * and assembles the same 60-bit integer (the first 15 hex chars ARE
  * the first 7.5 digest bytes) with eight shifts — no hex string ever
  * exists. The hash sits under every shingle/minhash/band/bloom/split
  * computation in the engine, so this is the hottest scalar in the
  * dedup stack. Value-identical to the composed form by construction
  * (parity property-pinned in ExpressionsSpec over unicode inputs) —
  * every DuckDB oracle is untouched.
  */
case class PortableHashExpr(child: Expression, salt: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_phash"

  private lazy val prefix: Array[Byte] =
    s"$salt:".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override protected def nullSafeEval(v: Any): Any =
    PortableHashExpr.hash(prefix, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val prefixRef = ctx.addReferenceObj("phashPrefix", prefix, "byte[]")
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.PortableHashExpr.hash($prefixRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PortableHashExpr =
    copy(child = newChild)
}

object PortableHashExpr {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static so generated code calls it without capturing `this`.
    * Returns the integer value of the digest's first 15 hex digits:
    * bytes 0..6 in full plus the high nibble of byte 7. */
  def hash(prefix: Array[Byte], s: UTF8String): Long = {
    val md = mdLocal.get()
    md.reset()
    md.update(prefix)
    md.update(s.getBytes)
    val b = md.digest()
    ((b(0) & 0xffL) << 52) | ((b(1) & 0xffL) << 44) |
      ((b(2) & 0xffL) << 36) | ((b(3) & 0xffL) << 28) |
      ((b(4) & 0xffL) << 20) | ((b(5) & 0xffL) << 12) |
      ((b(6) & 0xffL) << 4) | ((b(7) & 0xffL) >>> 4)
  }
}

/** Native per-document repetition counters — the four integers behind
  * `text_repetition`'s Gopher-style fractions, from ONE pass over the
  * token array: struct(n_bg = bigram total, top_bg = max bigram
  * multiplicity, n_tg = trigram total, n_dist_tg = distinct trigrams).
  *
  * Why an expression and not a plan: the answers are per-document, so
  * the scalable shape is a NARROW projection — the gram strings never
  * leave the mapper, nothing shuffles, nothing persists. And why ONE
  * expression for all four: the r14 A/B measured the alternatives —
  * the persisted explode → groupBy(doc, gram) → join plan at
  * 1.0-1.5 s (sf0.1, calm; and 4× noise-amplified in loaded windows
  * via its cache + per-gram hash-agg tables — it fired the driver
  * time gate in r12 AND r13), an `aggregate`-HOF-over-
  * array_sort narrow form at ~6.9 s (a Catalyst lambda tree
  * interpreted PER ELEMENT), and per-field expressions over
  * materialized shingle arrays at ~6.8 s (the gram arrays are built,
  * hashed and distinct'd repeatedly). A custom struct output cannot
  * be decomposed by SimplifyExtractValueOps (it is not a literal
  * CreateNamedStruct), so the optimizer provably evaluates it ONCE
  * per row, codegen'd, with zero intermediate gram arrays.
  *
  * Gram identity matches the shingle/oracle convention: tokens joined
  * by one space — injective because tokens ([a-z0-9]+) cannot contain
  * spaces, so count equality with the oracle's list algebra holds. */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = RepetitionStatsExpr.schema
  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(a: Any): Any =
    RepetitionStatsExpr.stats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.RepetitionStatsExpr.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n_bg", LongType, nullable = false),
    StructField("top_bg", LongType, nullable = false),
    StructField("n_tg", LongType, nullable = false),
    StructField("n_dist_tg", LongType, nullable = false)))

  private val space = UTF8String.fromString(" ")

  /** Static so generated code calls it without capturing `this`. The
    * maps live only within this single call, so UTF8String keys
    * pointing into the row buffer are safe. A null token (impossible
    * from regexp_extract_all, but the expression stays total) is
    * treated as the empty string. */
  def stats(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    def tok(i: Int): UTF8String =
      if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
    val nBg = math.max(0, n - 1)
    val nTg = math.max(0, n - 2)
    var topBg = 0
    var distTg = 0L
    if (nBg > 0) {
      val bgCounts = new java.util.HashMap[UTF8String, Integer](nBg * 2)
      var i = 0
      while (i < nBg) {
        val key = UTF8String.concat(tok(i), space, tok(i + 1))
        val prev = bgCounts.get(key)
        val c = if (prev == null) 1 else prev.intValue() + 1
        bgCounts.put(key, Integer.valueOf(c))
        if (c > topBg) topBg = c
        i += 1
      }
    }
    if (nTg > 0) {
      val tgSeen = new java.util.HashSet[UTF8String](nTg * 2)
      var i = 0
      while (i < nTg) {
        tgSeen.add(UTF8String.concat(tok(i), space, tok(i + 1), space, tok(i + 2)))
        i += 1
      }
      distTg = tgSeen.size().toLong
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nBg.toLong, topBg.toLong, nTg.toLong, distTg))
  }
}

object VectorExpressions {
  /** Column API for [[DotProductExpr]]. */
  def dotNative(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for [[RepetitionStatsExpr]]. */
  def repetitionStatsNative(c: Column): Column =
    ExpressionUtils.column(RepetitionStatsExpr(ExpressionUtils.expression(c)))

  /** Column API for [[NfcNormalizeExpr]]. */
  def nfcNative(c: Column): Column =
    ExpressionUtils.column(NfcNormalizeExpr(ExpressionUtils.expression(c)))

  /** Column API for [[PortableHashExpr]]. */
  def phashNative(c: Column, salt: Int): Column =
    ExpressionUtils.column(PortableHashExpr(ExpressionUtils.expression(c), salt))
}
