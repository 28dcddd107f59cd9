package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (Rabin–Karp family) over a string's code
  * points: `h = (h*31 + codepoint) mod 1e9+7`, folded left-to-right.
  *
  * Native replacement for the higher-order-function formulation
  * `aggregate(transform(split(text, ''), c -> ascii(c)), 0L,
  * (acc, c) -> (acc*31 + c) % 1000000007)`: HOF lambdas evaluate
  * interpreted and the split materializes a per-character array per row,
  * while this expression is one codegen'd loop with no intermediate
  * allocation beyond the row's String. Value-identical to the HOF form —
  * `split(text, '')` yields one code point per element and `ascii`
  * returns its code point — and to the DuckDB oracle's
  * `list_reduce(list_transform(string_split(text, ''), ascii), ...)`.
  *
  * Mirrors the reference's content-fingerprint role (document identity
  * that is order- and byte-edit-sensitive, unlike the sorted-token md5
  * fingerprint).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    java.lang.Long.valueOf(h)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |final String $s = $a.toString();
         |long ${ev.value}Acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  final int $cp = $s.codePointAt($i);
         |  ${ev.value}Acc = (${ev.value}Acc * 31L + $cp) % 1000000007L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
