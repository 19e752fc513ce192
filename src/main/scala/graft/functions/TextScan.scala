package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, CollationSupport, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass byte-scan twins of the regex/split text-statistics
  * pipeline (token counts, stopword counts, CJK count) — the langid /
  * quality-score hot path of the corpus-curation family.
  *
  * Why: the composed forms are java.util.regex NFA passes (4 stopword
  * alternations + 1 match-rich CJK strip per doc in `langId`) or
  * allocate a full token array just to `size()` it (`tokenCount`). At
  * the 100x ScaleProbe those scans ARE the query for the whole
  * quality/langid family (`langid` 7.8x, `quality_calibrated` 8.7x,
  * `corpus_filter` 9.8x — SCALE.md). Each expression here computes the
  * identical value in one branchy loop over the UTF8String bytes, inside
  * whole-stage codegen, with zero per-row allocation beyond the
  * lowercase copy where the original also lowercases. The DuckDB oracles
  * keep the regex/split forms, so every hash sweep re-proves
  * equivalence; TextScanSpec property-pins bit-equality on generated
  * mixed-script text.
  *
  * Bit-equality arguments (each pinned in TextScanSpec):
  *  - stopword counts: `regexp_count(lower(t), "(?:^|\s)(?:w1|..)(?=\s|\z)")`
  *    counts exactly the whitespace-delimited tokens equal to some word:
  *    the consumed `(?:^|\s)` anchors the word at a token start, the
  *    lookahead requires the token to END there, and a token can match at
  *    most once (the next match needs a later separator). Java `\s`
  *    without UNICODE_CHARACTER_CLASS is exactly [ \t\n\x0B\f\r], so
  *    byte-level tokenization is exact (multi-byte UTF-8 bytes are
  *    >= 0x80, never separators). Lowercase reuses Spark's OWN
  *    `CollationSupport.Lower` dispatch, as in [[NormalizeText]].
  *  - cjk count: `length(regexp_replace(t, "[^\x{4E00}-\x{9FFF}]", ""))`
  *    = number of code points in [U+4E00, U+9FFF]. The range is BMP-only
  *    and 3-byte in UTF-8 (0xE4..0xE9 lead), so decoding only 3-byte
  *    sequences is sufficient; supplementary code points are outside the
  *    class and removed by the regex too.
  *  - ws token count: Spark `split(x, re)` is `split(x, re, -1)` —
  *    Java `Pattern.split` with limit -1 KEEPS the trailing empty field
  *    and a positive-width leading match yields a leading empty field.
  *    So for trimmed (0x20-stripped — Spark `trim` strips spaces only)
  *    non-empty t: size = (# non-ws byte runs) + [t starts with ws] +
  *    [t ends with ws]; the empty guard maps to 0.
  *  - bpe-ish count: `regexp_count(t, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")`
  *    scans left-to-right non-overlapping: each ASCII alpha RUN counts
  *    once, each ASCII digit once, and every other code point that is
  *    not ASCII whitespace once (the negated class is per code point and
  *    `\s` is ASCII-only, so every non-ASCII code point counts).
  */
object TextScan {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Per-set token-equality counts over ONE tokenizer pass of lower(s). */
  def stopwordCounts(s: UTF8String, sets: Array[Array[Array[Byte]]],
      useICU: Boolean): ArrayData = {
    val b = CollationSupport.Lower.exec(s, 0 /* UTF8_BINARY */, useICU).getBytes
    val n = b.length
    val counts = new Array[Int](sets.length)
    var i = 0
    while (i < n) {
      if (isWs(b(i))) i += 1
      else {
        val start = i
        while (i < n && !isWs(b(i))) i += 1
        val len = i - start
        var si = 0
        while (si < sets.length) {
          val words = sets(si)
          var wi = 0
          var hit = false
          while (!hit && wi < words.length) {
            val w = words(wi)
            if (w.length == len) {
              var k = 0
              while (k < len && w(k) == b(start + k)) k += 1
              hit = k == len
            }
            wi += 1
          }
          if (hit) counts(si) += 1
          si += 1
        }
      }
    }
    new GenericArrayData(counts)
  }

  def stopwordCount(s: UTF8String, set: Array[Array[Byte]],
      useICU: Boolean): Int =
    stopwordCounts(s, Array(set), useICU).getInt(0)

  /** Code points in [U+4E00, U+9FFF] — the zh/ja script signal. */
  def cjkCount(s: UTF8String): Int = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    var count = 0
    while (i < n) {
      val lead = b(i) & 0xFF
      val len =
        if (lead < 0x80) 1 else if (lead < 0xE0) 2 else if (lead < 0xF0) 3 else 4
      if (len == 3 && i + 2 < n) {
        val cp = ((lead & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
        if (cp >= 0x4E00 && cp <= 0x9FFF) count += 1
      }
      i += len
    }
    count
  }

  /** `when(length(trim(t))===0, 0).otherwise(size(split(trim(t), "\s+")))`
    * without the token-array allocation.
    */
  def wsTokenCount(s: UTF8String): Int = {
    val b = s.getBytes
    var lo = 0
    var hi = b.length
    while (lo < hi && b(lo) == ' ') lo += 1
    while (hi > lo && b(hi - 1) == ' ') hi -= 1
    if (lo == hi) return 0
    var runs = 0
    var i = lo
    while (i < hi) {
      if (isWs(b(i))) i += 1
      else { runs += 1; while (i < hi && !isWs(b(i))) i += 1 }
    }
    runs + (if (isWs(b(lo))) 1 else 0) + (if (isWs(b(hi - 1))) 1 else 0)
  }

  /** `regexp_count(t, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")` in one pass. */
  def bpeishTokenCount(s: UTF8String): Int = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    var count = 0
    var prevAlpha = false
    while (i < n) {
      val lead = b(i) & 0xFF
      if (lead < 0x80) {
        val alpha = (lead >= 'A' && lead <= 'Z') || (lead >= 'a' && lead <= 'z')
        if (alpha) { if (!prevAlpha) count += 1 }
        else if (lead >= '0' && lead <= '9') count += 1
        else if (!isWs(lead.toByte)) count += 1
        prevAlpha = alpha
        i += 1
      } else {
        // any non-ASCII code point matches the negated class (ASCII-only \s)
        count += 1
        prevAlpha = false
        i += (if (lead < 0xE0) 2 else if (lead < 0xF0) 3 else 4)
      }
    }
    count
  }

  // ---- Column API ----

  def stopword_counts(text: Column, sets: Seq[Seq[String]]): Column =
    ColumnBridge.column(StopwordCountsExpr(ColumnBridge.expression(text), sets))

  def stopword_count(text: Column, words: Seq[String]): Column =
    ColumnBridge.column(StopwordCountExpr(ColumnBridge.expression(text), words))

  def cjk_count(text: Column): Column =
    ColumnBridge.column(CjkCountExpr(ColumnBridge.expression(text)))

  def ws_token_count(text: Column): Column =
    ColumnBridge.column(WsTokenCountExpr(ColumnBridge.expression(text)))

  def bpeish_token_count(text: Column): Column =
    ColumnBridge.column(BpeishTokenCountExpr(ColumnBridge.expression(text)))

  private[functions] def toBytes(sets: Seq[Seq[String]]): Array[Array[Array[Byte]]] =
    sets.map(_.map(_.getBytes("UTF-8")).toArray).toArray
}

/** Shared scaffolding for the TextScan expressions. */
sealed abstract class TextScanExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.checkString(child.dataType, prettyName)
}

case class StopwordCountsExpr(child: Expression, sets: Seq[Seq[String]])
    extends TextScanExpr {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "stopword_counts"

  @transient private lazy val setBytes = TextScan.toBytes(sets)

  // same conf read, same (lazy, first-use) timing as Lower.useICU
  private lazy val useICU: Boolean =
    SQLConf.get.getConf(SQLConf.ICU_CASE_MAPPINGS_ENABLED)

  protected override def nullSafeEval(input: Any): Any =
    TextScan.stopwordCounts(input.asInstanceOf[UTF8String], setBytes, useICU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sets", setBytes, "byte[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextScan.stopwordCounts($c, $ref, $useICU)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCountsExpr =
    copy(child = newChild)
}

case class StopwordCountExpr(child: Expression, words: Seq[String])
    extends TextScanExpr {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_count"

  @transient private lazy val wordBytes = TextScan.toBytes(Seq(words)).head

  private lazy val useICU: Boolean =
    SQLConf.get.getConf(SQLConf.ICU_CASE_MAPPINGS_ENABLED)

  protected override def nullSafeEval(input: Any): Any =
    TextScan.stopwordCount(input.asInstanceOf[UTF8String], wordBytes, useICU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("words", wordBytes, "byte[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextScan.stopwordCount($c, $ref, $useICU)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCountExpr =
    copy(child = newChild)
}

case class CjkCountExpr(child: Expression) extends TextScanExpr {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "cjk_count"

  protected override def nullSafeEval(input: Any): Any =
    TextScan.cjkCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.cjkCount($c)")

  override protected def withNewChildInternal(newChild: Expression): CjkCountExpr =
    copy(child = newChild)
}

case class WsTokenCountExpr(child: Expression) extends TextScanExpr {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ws_token_count"

  protected override def nullSafeEval(input: Any): Any =
    TextScan.wsTokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.wsTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokenCountExpr =
    copy(child = newChild)
}

case class BpeishTokenCountExpr(child: Expression) extends TextScanExpr {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpeish_token_count"

  protected override def nullSafeEval(input: Any): Any =
    TextScan.bpeishTokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.bpeishTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeishTokenCountExpr =
    copy(child = newChild)
}
