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
  * Bit-identical to the general expression BY CONSTRUCTION: `constNorm`
  * is sqrt of the index-order sum of squares (the exact double the
  * general form computes at runtime) and the final division keeps the
  * same association, `dot / (sqrt(na) * constNorm)`.
  */
case class CosineSimilarityConst(child: Expression,
                                 constVec: Array[Double],
                                 constNorm: Double) extends UnaryExpression {

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
    if (na == 0.0 || constNorm == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * constNorm))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val vec = ctx.addReferenceObj("constVec", constVec, "double[]")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val x = ctx.freshName("x")
      val getX = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $vec.length);
         |double $dot = 0.0, $na = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = $getX;
         |  $dot += $x * $vec[$i]; $na += $x * $x;
         |}
         |if ($na == 0.0 || $constNorm == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * $constNorm);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
