package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** [[CosineSimilarity]] specialized for a CONSTANT right-hand vector:
  * the probe's values and norm are folded in at plan time by
  * [[graft.FoldConstantCosine]], so the per-row loop accumulates only
  * `dot` and the row's own norm — one third fewer multiply-adds and one
  * fewer sqrt than the general form, on every row of an ANN scan.
  *
  * Bit-identical to the general expression BY CONSTRUCTION: the general
  * form accumulates BOTH norms over the common prefix
  * `n = min(|row|, |probe|)`, so the probe's norm is pre-folded for
  * EVERY prefix length — `prefixNorms(j)` is sqrt of the index-order
  * sum of the first j squares, the exact double the general form
  * computes at runtime — and the final division keeps the same
  * association, `dot / (sqrt(na) * prefixNorms(n))`. A row shorter than
  * the probe therefore divides by its prefix norm (and NULLs when that
  * prefix norm is zero), exactly as the unfolded expression does.
  */
case class CosineSimilarityConst(child: Expression,
                                 constVec: Array[Double],
                                 constNorm: Double) extends UnaryExpression {

  /** prefixNorms(j) = sqrt(v(0)² + … + v(j-1)²), accumulated in index
    * order; prefixNorms(constVec.length) == constNorm. One array lookup
    * per row — the per-row sqrt of the probe side stays folded out. */
  @transient private lazy val prefixNorms: Array[Double] = {
    val out = new Array[Double](constVec.length + 1)
    var s = 0.0; var i = 0
    while (i < constVec.length) { s += constVec(i) * constVec(i); out(i + 1) = math.sqrt(s); i += 1 }
    out(0) = 0.0
    out
  }

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity_const"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity_const expects array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), constVec.length)
    val lf = isFloat
    var dot = 0.0; var na = 0.0; var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      dot += x * constVec(i); na += x * x
      i += 1
    }
    val nb = prefixNorms(n)
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val vec = ctx.addReferenceObj("constVec", constVec, "double[]")
      val norms = ctx.addReferenceObj("prefixNorms", prefixNorms, "double[]")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val getX = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $vec.length);
         |double $dot = 0.0, $na = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = $getX;
         |  $dot += $x * $vec[$i]; $na += $x * $x;
         |}
         |final double $nb = $norms[$n];
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * $nb);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
