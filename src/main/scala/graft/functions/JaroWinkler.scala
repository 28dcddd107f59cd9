package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Jaro–Winkler algorithm behind [[JaroWinkler]], as a standalone
  * object so the codegen path can call it as a plain Java static
  * (Scala emits static forwarders for top-level objects) — one call
  * from inside whole-stage codegen, no interpreted expression tree.
  *
  * Semantics are pinned to the common C implementations (DuckDB's
  * `jaro_winkler_similarity`), gated two ways: a 3000-pair bit-exact
  * fuzz against an independent in-repo reimplementation
  * (JaroWinklerSpec, runs in `sbt test`) and the fz03 DuckDB oracle
  * (driver-run at sf0.01). The pinned choices:
  *   - either side empty → 0.0 (including both empty — NOT 1.0);
  *   - match window = max(0, max(len)/2 - 1), so equal 1-char strings
  *     still match (the window clamp, not an equality shortcut);
  *   - transpositions = half the matched-but-misordered count;
  *   - jaro = (m/l1 + m/l2 + (m-t)/m) / 3, in exactly that double
  *     operation order;
  *   - Winkler boost only when jaro > 0.7: jw = j + 0.1·p·(1-j) with
  *     p = common prefix length capped at 4.
  *
  * Operates on UTF-16 code units; identical to byte-based engines on
  * ASCII (the intended key domain — names, codes, titles).
  */
object JaroWinklerAlgo {

  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j <= 0.7) j
    else {
      var p = 0
      while (p < math.min(4, math.min(l1, l2)) && s1.charAt(p) == s2.charAt(p)) p += 1
      j + 0.1 * p * (1.0 - j)
    }
  }
}

/** `jaro_winkler(a, b)` → DOUBLE in [0, 1] — native Catalyst expression
  * for fuzzy string scoring (entity resolution, record linkage).
  * Spark has `levenshtein` but no Jaro–Winkler built-in; a Scala UDF
  * would box both strings and break whole-stage codegen, while this
  * expression stays inside the generated loop (one static call per
  * row). See [[JaroWinklerAlgo]] for the pinned semantics.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerAlgo.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
