package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BpeCount, BpeTokens, CosineSimilarity, JaroWinkler, RollingHash}

/** Library packaging for graft's native expressions: inject via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) so every session —
  * including ones created by spark-submit before any graft code runs —
  * has ALL of them: cosine_similarity, rolling_hash, bpe_tokens,
  * bpe_count, jaro_winkler. `functions.registerAll` remains the
  * per-session fallback for externally-built sessions (same five
  * functions — the two lists must stay in sync, gated by
  * GraftExtensionsSpec).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def inject(e: SparkSessionExtensions, name: String, arity: Int,
                     build: Seq[Expression] => Expression, clazz: Class[_]): Unit =
    e.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (args: Seq[Expression]) => {
        require(args.size == arity, s"$name expects $arity arguments, got ${args.size}")
        build(args)
      }))

  override def apply(e: SparkSessionExtensions): Unit = {
    inject(e, "cosine_similarity", 2,
      args => CosineSimilarity(args.head, args(1)), classOf[CosineSimilarity])
    inject(e, "rolling_hash", 1,
      args => RollingHash(args.head), classOf[RollingHash])
    inject(e, "bpe_tokens", 2,
      args => BpeTokens(args.head, args(1)), classOf[BpeTokens])
    inject(e, "bpe_count", 2,
      args => BpeCount(args.head, args(1)), classOf[BpeCount])
    inject(e, "jaro_winkler", 2,
      args => JaroWinkler(args.head, args(1)), classOf[JaroWinkler])
    e.injectOptimizerRule(_ => FoldConstantCosine)
  }
}
