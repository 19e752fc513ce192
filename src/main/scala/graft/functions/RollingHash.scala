package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: polynomial rolling hash over the UTF-8 bytes,
  * `h_i = (h_{i-1}·31 + byte_i) mod (2^31 − 1)`, h_0 = 0.
  *
  * A native Catalyst `Expression` with `doGenCode` (not a Scala UDF) so it
  * stays inside whole-stage codegen: no Row boxing, no closure dispatch —
  * the generated Java calls a static helper on the raw UTF8String bytes.
  * The recurrence is simple enough to replay in ANSI SQL (DuckDB
  * `list_reduce` over `ord(substr(...))` for ASCII inputs), which is what
  * the oracle does.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType}")

  protected override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Mod = 2147483647L // 2^31 − 1
  final val Mult = 31L

  /** Static entry point shared by interpreted eval and generated code.
    * Folds Unicode CODE POINTS (not UTF-8 bytes) so the SQL oracles'
    * character indexing (`ord(text[c])`) replays it exactly on
    * non-ASCII text too (the winnow/ADVICE r5 lesson, applied to the
    * whole hash family).
    */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * Mult + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column API. */
  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}
