package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token scans over a STRING column (VERDICT r5 item 4: the
  * per-token `transform`/`aggregate` higher-order functions are
  * CodegenFallback — evaluated interpreted, one closure call and one
  * boxed element per token). Each expression here replaces one such
  * fold with a single linear byte scan of the UTF8String, inside
  * whole-stage codegen, allocating nothing but the output.
  *
  * Tokenization matches `split(text, ' ')` exactly: tokens are the
  * (possibly empty) byte runs between 0x20 bytes — safe on UTF-8
  * because continuation bytes are ≥ 0x80, so a space byte is never
  * part of a multi-byte character. Character counts step over lead
  * bytes only, matching `length()` (= UTF8String.numChars) code-point
  * semantics.
  */
object TextScan {

  /** Number of code points in bytes[from, until). */
  private def numChars(bytes: Array[Byte], from: Int, until: Int): Int = {
    var n = 0; var i = from
    while (i < until) { if ((bytes(i) & 0xC0) != 0x80) n += 1; i += 1 }
    n
  }

  /** Code point of the first character of bytes[from, until), 0 if
    * empty — the value `ascii(substring(t, 1, 1))` yields (Spark and
    * DuckDB both return the Unicode code point; 0 on '').
    * Malformed UTF-8 falls back to the unsigned lead byte.
    */
  private def firstCodePoint(bytes: Array[Byte], from: Int, until: Int): Int = {
    if (from >= until) return 0
    val b0 = bytes(from) & 0xFF
    if (b0 < 0x80) b0
    else if ((b0 >> 5) == 0x6 && from + 1 < until)
      ((b0 & 0x1F) << 6) | (bytes(from + 1) & 0x3F)
    else if ((b0 >> 4) == 0xE && from + 2 < until)
      ((b0 & 0x0F) << 12) | ((bytes(from + 1) & 0x3F) << 6) | (bytes(from + 2) & 0x3F)
    else if ((b0 >> 3) == 0x1E && from + 3 < until)
      ((b0 & 0x07) << 18) | ((bytes(from + 1) & 0x3F) << 12) |
        ((bytes(from + 2) & 0x3F) << 6) | (bytes(from + 3) & 0x3F)
    else b0
  }

  /** max(length(token)) over split(text, ' ') — including the implicit
    * empty tokens of consecutive/trailing spaces (length 0, so they
    * only matter for the all-empty case, where the max is 0, same as
    * `array_max(transform(split(text, ' '), t -> length(t)))`).
    */
  def maxTokenLen(s: UTF8String): Long = {
    val bytes = s.getBytes
    var best = 0; var cur = 0; var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { if (cur > best) best = cur; cur = 0 }
      else if ((bytes(i) & 0xC0) != 0x80) cur += 1
      i += 1
    }
    if (cur > best) best = cur
    best.toLong
  }

  /** The [[graft.llm.TextOps.fingerprint]] rolling hash:
    * `aggregate(split(text,' '), 0L, (h,t) ->
    *   (h*1000003 + ascii(substring(t,1,1))*256 + length(t)) % 2147483647)`
    * as one scan. Empty tokens (consecutive spaces, empty text)
    * contribute (0, 0) exactly as the fold does.
    */
  def rollingFingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    var h = 0L
    var tokStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        h = (h * 1000003L +
          firstCodePoint(bytes, tokStart, i) * 256L +
          numChars(bytes, tokStart, i)) % 2147483647L
        tokStart = i + 1
      }
      i += 1
    }
    h
  }
}

object TokenArrayScan {
  import org.apache.spark.sql.catalyst.util.ArrayData

  /** Tokens of `toks` whose 1-based position is NOT in `cov`
    * (a sorted array of distinct in-range positions), joined by a
    * single space — one merge scan, O(|toks| + |cov|). `cov` never
    * contains nulls (it is an aggregated collect_set).
    */
  def removeCovered(toks: ArrayData, cov: ArrayData): UTF8String = {
    val n = toks.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    var c = 0
    var i = 0
    while (i < n) {
      val pos = i + 1
      while (c < cov.numElements() && cov.getInt(c) < pos) c += 1
      if (c >= cov.numElements() || cov.getInt(c) != pos)
        kept.add(toks.getUTF8String(i))
      i += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "),
      kept.toArray(new Array[UTF8String](kept.size())): _*)
  }
}

private[functions] abstract class TextScanExpr extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.sql}")
  }
  protected def method: String
  // `graft.functions.TextScan` is a standalone object, so Scala emits
  // static forwarders the generated Java can call directly — the
  // expression stays inside WholeStageCodegen with a one-line body.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.$method($c)")
}

/** length of the longest space-separated token, in code points. */
case class MaxTokenLen(child: Expression) extends TextScanExpr {
  override def prettyName: String = "max_token_len"
  override protected def method: String = "maxTokenLen"
  override protected def nullSafeEval(input: Any): Any =
    TextScan.maxTokenLen(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** polynomial rolling hash over per-token (first code point, length). */
case class RollingFingerprint(child: Expression) extends TextScanExpr {
  override def prettyName: String = "rolling_fingerprint"
  override protected def method: String = "rollingFingerprint"
  override protected def nullSafeEval(input: Any): Any =
    TextScan.rollingFingerprint(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `removeCovered(toks, cov)`: the tokens whose 1-based position is
  * not listed in the sorted `cov` array, space-joined — the in-row
  * rebuild of span-level dedup removal. O(|toks| + |cov|) merge scan
  * in whole-stage codegen; replaces a full-corpus explode → anti-join
  * → collect_list → array_sort reassembly (two shuffles of every
  * token in the corpus) with a per-document scan.
  */
case class RemoveCoveredTokens(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, IntegerType}

  override def dataType: DataType = StringType
  override def prettyName: String = "remove_covered_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<STRING>, ARRAY<INT> not null), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(toks: Any, cov: Any): Any =
    TokenArrayScan.removeCovered(
      toks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      cov.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, c) => s"graft.functions.TokenArrayScan.removeCovered($t, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level API for the token-scan expressions. */
object TextScanFunctions {
  def maxTokenLen(text: Column): Column =
    ColumnBridge.toColumn(MaxTokenLen(ColumnBridge.toExpr(text)))
  def rollingFingerprint(text: Column): Column =
    ColumnBridge.toColumn(RollingFingerprint(ColumnBridge.toExpr(text)))
  def removeCoveredTokens(toks: Column, cov: Column): Column =
    ColumnBridge.toColumn(RemoveCoveredTokens(
      ColumnBridge.toExpr(toks), ColumnBridge.toExpr(cov)))
}
