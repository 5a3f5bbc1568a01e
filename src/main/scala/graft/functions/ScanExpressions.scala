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

case class GramHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"gram width must be >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.BinaryType, containsNull = true)
  override def prettyName: String = "graft_gram_hashes"

  override protected def nullSafeEval(v: Any): Any =
    GramHashesExpr.grams(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.GramHashesExpr.grams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): GramHashesExpr =
    copy(child = newChild)
}

/** Per-window MD5 digests for the exact-substring / winnowing gram
  * streams — the byte-scan twin of
  * `transform(sequence(1, length-k+1), i -> md5(substr(text, i, k)))`.
  * Emits the 16-byte BINARY digest instead of the 32-char hex string:
  * hex ↔ binary is a bijection, so every equality, grouping and join
  * downstream is unchanged — while the exploded stream (the dominant
  * shuffle of the substring family) carries half the bytes. Windows
  * are CHAR windows (substr semantics), honored via one char→byte
  * offset walk per row. */
object GramHashesExpr {
  private val Empty = new GenericArrayData(Array.empty[Any])
  private[graft] val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Byte offsets of each char start, plus the end offset — the
    * substr() char arithmetic over a UTF-8 buffer. */
  private[graft] def charOffsets(b: Array[Byte]): Array[Int] = {
    // worst case 1 byte per char
    val tmp = new Array[Int](b.length + 1)
    var nChars = 0
    var i = 0
    while (i < b.length) {
      tmp(nChars) = i
      i += UTF8String.numBytesForFirstByte(b(i))
      nChars += 1
    }
    tmp(nChars) = b.length
    java.util.Arrays.copyOf(tmp, nChars + 1)
  }

  def grams(s: UTF8String, k: Int): ArrayData = {
    val b = s.getBytes
    val off = charOffsets(b)
    val nChars = off.length - 1
    if (nChars < k) return Empty
    val md = mdLocal.get()
    val out = new Array[Any](nChars - k + 1)
    var i = 0
    while (i <= nChars - k) {
      md.reset()
      md.update(b, off(i), off(i + k) - off(i))
      out(i) = md.digest()
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class WinnowSelectExpr(child: Expression, k: Int, w: Int, withPos: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && w >= 1, s"winnowing needs k,w >= 1, got k=$k w=$w")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    if (withPos)
      ArrayType(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("h",
          org.apache.spark.sql.types.BinaryType, nullable = false),
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.LongType, nullable = false))),
        containsNull = false)
    else ArrayType(org.apache.spark.sql.types.BinaryType, containsNull = false)
  override def prettyName: String = "graft_winnow_select"

  override protected def nullSafeEval(v: Any): Any =
    WinnowSelectExpr.select(v.asInstanceOf[UTF8String], k, w, withPos)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.WinnowSelectExpr.select($c, $k, $w, $withPos)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelectExpr =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer et al. 2003) in one
  * linear pass — the fused twin of the md5-gram transform + the
  * O(n·w) interpreted `array_min(slice(gr, j+1, w))` window chain.
  *
  * Selection semantics are EXACTLY the old chain's:
  *  - `withPos = false`: per window of w grams, the minimum md5 VALUE.
  *    Hex strings order like their binary digests (hex encoding is
  *    order-preserving per byte), so unsigned byte comparison on the
  *    16-byte digest reproduces `array_min` over hex strings.
  *  - `withPos = true`: the old chain array_min's `md5hex ||
  *    lpad(pos, 10, '0')` — digest order first, LEFTMOST occurrence on
  *    digest ties (zero-padded positions compare numerically).
  * Output is the DISTINCT selections (the old `array_distinct`),
  * first-seen order. A monotone deque gives O(n) amortized where the
  * interpreted chain re-scanned w grams per window. */
object WinnowSelectExpr {
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** unsigned bytewise compare — the order md5 hex strings sort in */
  @inline private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  def select(s: UTF8String, k: Int, w: Int, withPos: Boolean): ArrayData = {
    val b = s.getBytes
    val off = GramHashesExpr.charOffsets(b)
    val nChars = off.length - 1
    if (nChars < k) return Empty
    val nGrams = nChars - k + 1
    if (nGrams < w) return Empty
    val md = GramHashesExpr.mdLocal.get()
    val grams = new Array[Array[Byte]](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      md.update(b, off(i), off(i + k) - off(i))
      grams(i) = md.digest()
      i += 1
    }
    // monotone deque of gram indices: increasing by (digest, index).
    // Strictly-smaller evicts; on EQUAL digests the earlier index wins
    // (leftmost tie-break), so equal incoming digests do NOT evict.
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val selected = new java.util.LinkedHashSet[AnyRef]
    val outPos = new java.util.ArrayList[AnyRef]
    var lastSel = -1
    i = 0
    while (i < nGrams) {
      while (tail > head && cmp(grams(deque(tail - 1)), grams(i)) > 0) tail -= 1
      deque(tail) = i
      tail += 1
      while (deque(head) < i - w + 1) head += 1
      if (i >= w - 1) {
        val sel = deque(head)
        if (withPos) {
          if (sel != lastSel) {
            // distinct (h, pos) selections in first-seen order; the
            // same gram re-selected by later windows is the only
            // duplicate source, and sel is non-decreasing
            outPos.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](grams(sel), (sel + 1).toLong)))
            lastSel = sel
          }
        } else {
          selected.add(UTF8String.fromBytes(grams(sel)): AnyRef)
        }
      }
      i += 1
    }
    if (withPos) new GenericArrayData(outPos.toArray)
    else {
      // distinct digest VALUES (array_distinct over the min values);
      // stored as UTF8String keys in the set for equality, emitted as
      // byte arrays
      val vals = selected.toArray
      val arr = new Array[Any](vals.length)
      var j = 0
      while (j < vals.length) {
        arr(j) = vals(j).asInstanceOf[UTF8String].getBytes
        j += 1
      }
      new GenericArrayData(arr)
    }
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

  /** Column API for [[GramHashesExpr]]. */
  def gramHashes(c: Column, k: Int): Column =
    ExpressionUtils.column(GramHashesExpr(ExpressionUtils.expression(c), k))

  /** Column API for [[WinnowSelectExpr]]. */
  def winnowSelect(c: Column, k: Int, w: Int, withPos: Boolean): Column =
    ExpressionUtils.column(
      WinnowSelectExpr(ExpressionUtils.expression(c), k, w, withPos))
}
