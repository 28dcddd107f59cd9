package graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.{CosineSimilarity, CosineSimilarityConst}

/** Optimizer rule: `cosine_similarity(col, <foldable vector>)` (either
  * side) → [[CosineSimilarityConst]] with the probe's values and norm
  * evaluated once at plan time. The ANN probe pattern — a `typedLit`
  * query vector against a 100 TB corpus — otherwise re-accumulates the
  * probe's norm and re-reads its boxed elements on EVERY row; folding
  * removes a third of the inner-loop work and one sqrt per row.
  *
  * Rewrite fires only when it is bit-exact: the folded norm is the
  * index-order sum of squares (identical accumulation to the runtime
  * form) and a zero-norm probe is left to the general expression's
  * null semantics. Cosine is symmetric, so a foldable LEFT side swaps.
  *
  * Registered by [[GraftExtensions]] (`injectOptimizerRule`) and by
  * [[GraftSession]] via `spark.experimental.extraOptimizations` for
  * externally built sessions.
  */
object FoldConstantCosine extends Rule[LogicalPlan] {

  private def asDoubles(e: Expression): Option[Array[Double]] = {
    val elemType = e.dataType match {
      case ArrayType(t, _) => t
      case _ => return None
    }
    Option(e.eval(null)).map { raw =>
      val a = raw.asInstanceOf[ArrayData]
      val out = new Array[Double](a.numElements())
      var i = 0
      while (i < out.length) {
        out(i) = if (elemType == FloatType) a.getFloat(i).toDouble else a.getDouble(i)
        i += 1
      }
      out
    }
  }

  private def norm(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CosineSimilarity(l, r) if r.foldable && !l.foldable =>
      asDoubles(r).filter(norm(_) != 0.0)
        .map(v => CosineSimilarityConst(l, v, norm(v)): Expression)
        .getOrElse(CosineSimilarity(l, r))
    case CosineSimilarity(l, r) if l.foldable && !r.foldable =>
      asDoubles(l).filter(norm(_) != 0.0)
        .map(v => CosineSimilarityConst(r, v, norm(v)): Expression)
        .getOrElse(CosineSimilarity(l, r))
  }
}
