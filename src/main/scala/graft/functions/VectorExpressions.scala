package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd vector expressions for the similarity-search operators
  * (embedding columns are `array<float>`; reference-scale corpora make a
  * per-row Scala UDF with Row boxing the wrong tool — these stay inside
  * whole-stage codegen and read the ArrayData buffers directly).
  *
  * Both expressions accumulate in DOUBLE in ascending element order, so an
  * ANSI-SQL oracle can replay them bit-exactly with an explicit left fold
  * (DuckDB `list_reduce`), the same discipline as [[RollingHash]].
  */
object VectorExpressions {

  /** Cosine similarity, accumulated in double, ascending index order.
    * Returns 0.0 for a zero-norm side (deterministic, no NaN in results).
    */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"cosine_sim: length mismatch ${n} vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Sign-random-projection LSH signature: bit i of the result is
    * `sign(Σ_j v[j]·r(i,j)) > 0`, with Rademacher hyperplane entries
    * `r(i,j) ∈ {−1,+1}` drawn from a Knuth multiplicative integer hash of
    * `k = i·dim + j` — exact integer arithmetic, reproducible in any SQL
    * engine (no float RNG). Per-bit dot products accumulate in ascending
    * j, so an explicit-fold oracle matches bit-for-bit.
    */
  def lshSignature(v: ArrayData, isFloat: Boolean, nBits: Int): Long = {
    val dim = v.numElements()
    val dots = new Array[Double](nBits)
    var j = 0
    while (j < dim) {
      val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
      var i = 0
      while (i < nBits) {
        val h = ((i.toLong * dim + j) * 2654435761L) & 0xFFFFFFFFL
        dots(i) += (if (((h >> 16) & 1L) == 1L) x else -x)
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < nBits) { if (dots(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  /** IVF coarse-quantizer assignment: id of the centroid with the highest
    * cosine similarity to `v` (ties → the earliest array slot, i.e. the
    * lowest id when `cents`/`ids` are sorted ascending). Same double-
    * accumulation contract as [[cosine]], so swapping this in for a Scala
    * UDF changes no result bits — only removes the Row boxing from the
    * corpus-wide assignment pass.
    */
  def bestCell(v: ArrayData, isFloat: Boolean,
      cents: Array[Array[Float]], ids: Array[Long]): Long = {
    val dim = v.numElements()
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < dim) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val y = cent(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val s = if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
      if (s > bestSim) { bestSim = s; best = c }
      c += 1
    }
    ids(best)
  }

  private[functions] def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private[functions] def checkVec(dt: DataType, who: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$who requires array<float>/array<double>, got $other")
    }

  /** Column API. */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def lsh_signature(v: Column, nBits: Int): Column =
    ColumnBridge.column(LshSignature(ColumnBridge.expression(v), nBits))

  /** An EMPTY centroid table (an empty corpus slice at seed time — the
    * degenerate-input contract, see DegenerateProbe) assigns every row a
    * null cell: downstream cell-equi joins and IN-probe filters then
    * match nothing, which is exactly what the ANSI oracles' scalar
    * subqueries replay (LIMIT 1 over zero centroid rows = NULL).
    */
  def best_cell(v: Column, cents: Array[Array[Float]], ids: Array[Long]): Column =
    if (cents.isEmpty) ColumnBridge.column(Literal(null, LongType))
    else ColumnBridge.column(BestCell(ColumnBridge.expression(v), cents, ids))
}

case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VectorExpressions.checkVec(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VectorExpressions.checkVec(right.dataType, prettyName)
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorExpressions.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      VectorExpressions.isFloatArray(left.dataType),
      VectorExpressions.isFloatArray(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val af = VectorExpressions.isFloatArray(left.dataType)
    val bf = VectorExpressions.isFloatArray(right.dataType)
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorExpressions.cosine($a, $b, $af, $bf)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

case class LshSignature(child: Expression, nBits: Int)
    extends UnaryExpression {

  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1,63], got $nBits")

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_signature"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkVec(child.dataType, prettyName)

  protected override def nullSafeEval(input: Any): Any =
    VectorExpressions.lshSignature(input.asInstanceOf[ArrayData],
      VectorExpressions.isFloatArray(child.dataType), nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = VectorExpressions.isFloatArray(child.dataType)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorExpressions.lshSignature($c, $f, $nBits)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}

/** IVF cell assignment as a codegen'd expression: the centroid table rides
  * into the generated code as a reference object (the broadcast-closure J3
  * posture — MB-scale for ≤64k cells), so the corpus-wide pass stays inside
  * whole-stage codegen with no Row boxing and no join against the centroid
  * table (an n×nCells shuffle at 10^9 vectors).
  */
case class BestCell(child: Expression,
    cents: Array[Array[Float]], ids: Array[Long])
    extends UnaryExpression {

  require(cents.nonEmpty && cents.length == ids.length,
    s"best_cell: ${cents.length} centroids vs ${ids.length} ids")

  override def dataType: DataType = LongType
  override def prettyName: String = "best_cell"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkVec(child.dataType, prettyName)

  protected override def nullSafeEval(input: Any): Any =
    VectorExpressions.bestCell(input.asInstanceOf[ArrayData],
      VectorExpressions.isFloatArray(child.dataType), cents, ids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = VectorExpressions.isFloatArray(child.dataType)
    val cRef = ctx.addReferenceObj("bestCellCents", cents, "float[][]")
    val iRef = ctx.addReferenceObj("bestCellIds", ids, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorExpressions.bestCell($c, $f, $cRef, $iRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BestCell =
    copy(child = newChild)
}
