package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.CollationSupport
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text canonicalization for normalized dedup:
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))`
  * as ONE byte scan instead of two full java.util.regex passes.
  *
  * This is the 100 TB dedup-preprocessing hot path (reference behavior:
  * normalized exact dedup ahead of shingle near-dup — see
  * `q_d_norm_dedup`). At the 100x ScaleProbe the regex pipeline is
  * bytes-linear but regex-engine-bound; this expression computes the
  * identical output with one branchy loop per byte, staying inside
  * whole-stage codegen (static call, no NFA, no intermediate strings
  * beyond the lowercase copy).
  *
  * Bit-equality argument (pinned by the NormalizeTextSpec property test):
  *  - lowercase reuses Spark's OWN default-collation dispatch
  *    (`CollationSupport.Lower.exec(s, UTF8_BINARY, useICU)` with the
  *    same `ICU_CASE_MAPPINGS_ENABLED` conf read `Lower` does), so
  *    step 1 is the same bytes `lower(col)` produces — by construction,
  *    not by imitation;
  *  - the regex replaces each non-[a-z0-9 ] CODE POINT with one 0x20,
  *    then collapses runs and trims. Scanning BYTES is equivalent: every
  *    byte of a multi-byte UTF-8 sequence is outside [a-z0-9 ] (all are
  *    >= 0x80), so a k-byte char becomes k spaces instead of one — and
  *    any run of >= 1 spaces collapses to exactly one, and edge runs
  *    trim away. Only the space-run structure differs mid-pass, never
  *    the final string.
  *  - collapse + trim fold into the same scan: a kept byte emits a
  *    single pending space first (unless at output start); trailing
  *    pending space is simply never flushed.
  */
object NormalizeText {

  /** lower → strip non-[a-z0-9] to space → collapse runs → trim, one pass.
    * `useICU` must be the planning-time `ICU_CASE_MAPPINGS_ENABLED` value
    * (the expression captures it exactly as `Lower` does).
    */
  def normalize(s: UTF8String, useICU: Boolean): UTF8String = {
    val lower = CollationSupport.Lower.exec(s, 0 /* UTF8_BINARY */, useICU)
    val b = lower.getBytes
    val n = b.length
    val out = new Array[Byte](n)
    var i = 0
    var o = 0
    var pendingSpace = false
    while (i < n) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = c
        o += 1
      } else if (o > 0) {
        // leading junk never arms the pending space → implicit left-trim
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  def normalize_text(text: Column): Column =
    ColumnBridge.column(NormalizeTextExpr(ColumnBridge.expression(text)))
}

case class NormalizeTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.checkString(child.dataType, prettyName)

  // same conf read, same (lazy, first-use) timing as Lower.useICU
  private lazy val useICU: Boolean =
    SQLConf.get.getConf(SQLConf.ICU_CASE_MAPPINGS_ENABLED)

  protected override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String], useICU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.normalize($c, $useICU)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}
