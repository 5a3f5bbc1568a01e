/* Same org.apache.spark.sql subpackage rationale as
 * VectorExpressions.scala: Catalyst's expression-authoring surface is
 * private[sql]; extension libraries shipping native expressions compile
 * into the sql namespace. The engine's public API re-exports these from
 * graft.functions.TextFunctions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native byte-scanning replacements for the interpreted scalar chains
  * under the text/dedup hot paths — r17 optimization round, guide §4
  * ("eliminate non-codegen expressions / closures in the hot path").
  *
  * Each expression is VALUE-IDENTICAL to the composed built-in chain it
  * replaces (property-pinned in ScanExpressionsSpec against the old
  * form over adversarial inputs, and every DuckDB oracle is untouched);
  * what changes is the cost model:
  *
  *  - [[AsciiTokensExpr]] replaces
  *    `regexp_extract_all(lowered, '[a-z0-9]+')`: the token class is
  *    pure ASCII, and in UTF-8 every byte of a multi-byte code point
  *    has the high bit set, so maximal [a-z0-9] BYTE runs are exactly
  *    the regex's code-point matches — one branchy byte scan, no
  *    java.util.regex machinery, no per-match Matcher state.
  *  - [[ShinglesExpr]] replaces the interpreted HOF chain
  *    `transform(sequence(1, n-k+1), i -> concat_ws(' ', slice(t,i,k)))`:
  *    Catalyst lambda functions are evaluated per ELEMENT with bound
  *    lambda variables (never codegen'd); this emits each shingle with
  *    one `UTF8String.concatWs` per window, participating in
  *    whole-stage codegen. Null elements are skipped by concatWs —
  *    concat_ws semantics, bit-for-bit.
  *  - [[SymPairsExpr]] replaces the per-round BPE pair extraction
  *    `transform(sequence(1, size-1), i -> concat(sy[i], ' ', sy[i+1]))`
  *    over `split(syms, ' ')`: consecutive space-separated symbols are
  *    CONTIGUOUS byte spans of the input, so each pair is a zero-copy
  *    slice — no split array, no per-element lambda, no concat.
  *  - [[BpeMergeExpr]] replaces the `aggregate` fold whose lambda ran
  *    TWO java.util.regex operations per symbol
  *    (`regexp_extract(acc,'[^ ]+$')` + `regexp_replace`): one linear
  *    byte walk that drops the separator space between greedy
  *    leftmost-non-overlapping (a,b) symbol pairs — the same fold
  *    semantics (after a merge the new last symbol is `ab`, which can
  *    never re-match `a` since `b` is non-empty; adjacent overlaps
  *    cannot double-fire).
  */
case class AsciiTokensExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  // containsNull matches RegExpExtractAll's ArrayType(StringType)
  // default so downstream schema derivations are unchanged
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_ascii_tokens"

  override protected def nullSafeEval(v: Any): Any =
    AsciiTokensExpr.tokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.AsciiTokensExpr.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): AsciiTokensExpr =
    copy(child = newChild)
}

object AsciiTokensExpr {
  private val Empty = new GenericArrayData(Array.empty[Any])

  @inline private def isTok(c: Byte): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** Static so generated code calls it without capturing `this`. Two
    * passes: count runs (exact-size output array, no growth copies),
    * then emit each run as a UTF8String over the shared byte array. */
  def tokens(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    var count = 0
    var i = 0
    while (i < n) {
      if (isTok(b(i))) {
        count += 1
        i += 1
        while (i < n && isTok(b(i))) i += 1
      } else i += 1
    }
    if (count == 0) return Empty
    val out = new Array[Any](count)
    var k = 0
    i = 0
    while (i < n) {
      if (isTok(b(i))) {
        val st = i
        i += 1
        while (i < n && isTok(b(i))) i += 1
        out(k) = UTF8String.fromBytes(b, st, i - st)
        k += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }
}

case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  // the old when/transform/otherwise chain unified to containsNull=true
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(v: Any): Any =
    ShinglesExpr.shingles(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.ShinglesExpr.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {
  private val Empty = new GenericArrayData(Array.empty[Any])
  private val Space = UTF8String.fromString(" ")

  /** Static for codegen. Window i holds tokens i..i+n-1 joined by one
    * space; null tokens are SKIPPED (concat_ws contract — they cannot
    * occur from tokenization, but the expression stays total). */
  def shingles(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    if (sz < n) return Empty
    val out = new Array[Any](sz - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= sz - n) {
      var k = 0
      while (k < n) {
        parts(k) = if (arr.isNullAt(i + k)) null else arr.getUTF8String(i + k)
        k += 1
      }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class SymPairsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_sym_pairs"

  override protected def nullSafeEval(v: Any): Any =
    SymPairsExpr.pairs(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.SymPairsExpr.pairs($c)")

  override protected def withNewChildInternal(newChild: Expression): SymPairsExpr =
    copy(child = newChild)
}

object SymPairsExpr {
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Adjacent space-separated symbol pairs as byte spans: with exactly
    * one separator byte between consecutive symbols, the span from
    * symbol k's start to symbol k+1's end IS `sym_k ++ " " ++ sym_k+1`
    * — including the empty-symbol edge cases of split-with-limit=-1
    * (leading/trailing/adjacent separators). */
  def pairs(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    var spaces = 0
    var i = 0
    while (i < n) { if (b(i) == ' ') spaces += 1; i += 1 }
    if (spaces == 0) return Empty
    // starts(k) = byte offset of symbol k (k in 0..spaces)
    val starts = new Array[Int](spaces + 1)
    var si = 1
    i = 0
    while (i < n) { if (b(i) == ' ') { starts(si) = i + 1; si += 1 }; i += 1 }
    val out = new Array[Any](spaces)
    var k = 0
    while (k < spaces) {
      val st = starts(k)
      val en = if (k + 2 <= spaces) starts(k + 2) - 1 else n
      out(k) = UTF8String.fromBytes(b, st, en - st)
      k += 1
    }
    new GenericArrayData(out)
  }
}

case class BpeMergeExpr(child: Expression, a: String, b: String)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_merge"

  private lazy val aBytes = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private lazy val bBytes = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override protected def nullSafeEval(v: Any): Any =
    BpeMergeExpr.merge(v.asInstanceOf[UTF8String], aBytes, bBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeMergeA", aBytes, "byte[]")
    val bRef = ctx.addReferenceObj("bpeMergeB", bBytes, "byte[]")
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.BpeMergeExpr.merge($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeExpr =
    copy(child = newChild)
}

object BpeMergeExpr {
  @inline private def regionEq(b: Array[Byte], st: Int, en: Int,
      pat: Array[Byte]): Boolean = {
    if (en - st != pat.length) return false
    var i = 0
    while (i < pat.length) {
      if (b(st + i) != pat(i)) return false
      i += 1
    }
    true
  }

  /** One linear walk over the space-separated symbol string: whenever
    * the LAST EMITTED symbol equals `a` and the next input symbol
    * equals `b`, the separating space is dropped (the two symbols fuse
    * to `ab`); the fused symbol is what subsequent comparisons see —
    * exactly the left-fold's accumulator semantics. Output can only
    * shrink, so it builds in place over an input-sized buffer. */
  def merge(s: UTF8String, a: Array[Byte], b: Array[Byte]): UTF8String = {
    val in = s.getBytes
    val n = in.length
    val out = new Array[Byte](n)
    var oi = 0        // bytes written
    var lastStart = 0 // start of the last emitted symbol in `out`
    var i = 0         // input cursor
    var first = true
    while (i <= n) {
      // input symbol = in[st, en)
      val st = i
      var en = i
      while (en < n && in(en) != ' ') en += 1
      if (first) {
        System.arraycopy(in, st, out, 0, en - st)
        oi = en - st
        lastStart = 0
        first = false
      } else if (regionEq(out, lastStart, oi, a) && regionEq(in, st, en, b)) {
        // fuse: append b's bytes with no separator; last symbol is now ab
        System.arraycopy(in, st, out, oi, en - st)
        oi += en - st
      } else {
        out(oi) = ' '
        oi += 1
        lastStart = oi // the new symbol starts right after the space
        System.arraycopy(in, st, out, oi, en - st)
        oi += en - st
      }
      i = en + 1
    }
    UTF8String.fromBytes(out, 0, oi)
  }
}

object ScanExpressions {
  /** Column API for [[AsciiTokensExpr]] — caller lowers first. */
  def asciiTokens(c: Column): Column =
    ExpressionUtils.column(AsciiTokensExpr(ExpressionUtils.expression(c)))

  /** Column API for [[ShinglesExpr]]. */
  def shinglesNative(c: Column, n: Int): Column =
    ExpressionUtils.column(ShinglesExpr(ExpressionUtils.expression(c), n))

  /** Column API for [[SymPairsExpr]]. */
  def symPairs(c: Column): Column =
    ExpressionUtils.column(SymPairsExpr(ExpressionUtils.expression(c)))

  /** Column API for [[BpeMergeExpr]]. */
  def bpeMerge(c: Column, a: String, b: String): Column =
    ExpressionUtils.column(BpeMergeExpr(ExpressionUtils.expression(c), a, b))
}
