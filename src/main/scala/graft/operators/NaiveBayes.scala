package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.tokens

/** Multinomial Naive Bayes text classifier — train and score in one
  * distributed pass structure, exact across engines: every per-token
  * log-likelihood is floored to integer MICRO-NATS before any
  * summation (the ta07 bigram-NLL discipline), so scores are sums of
  * integers — order-independent under any partitioning — and the
  * argmax (ties → class asc) is bit-reproducible.
  *
  * Laplace-smoothed: p(term|class) = (c(class,term)+1)/(c(class)+|V|),
  * prior = docs(class)/docs. A token unseen in a class contributes
  * floor(1e6·ln(1/(c(class)+|V|))) — handled by the left join's
  * missing-count-as-zero, no per-class vocabulary grid materialized.
  *
  * Scale shape: training is two token-keyed aggregates (class-term
  * counts bounded by |V|·|classes|, class totals by |classes|); the
  * driver-side materializations are the |V| scalar and the
  * |classes|-row doc-count table (both bounded model artifacts — the
  * priors derive from the latter as literals, saving two extra
  * corpus-side actions). Scoring explodes each document's
  * tokens × |classes| (a fixed small multiplier), left-joins the
  * class-term count table (bounded by observed vocabulary — AQE
  * broadcasts it when small), one doc×class aggregate, and a 4-row
  * window per doc for the argmax.
  */
object NaiveBayes {

  /** Resubstitution classification: train on `docs` (doc_id, textCol,
    * classCol), score the same corpus.
    * @return (doc_id, pred, score_micro, actual, correct) */
  def trainAndClassify(docs: DataFrame, textCol: String,
                       classCol: String): DataFrame = {
    val tok = docs.select(col("doc_id"), col(classCol).as("__cls"),
      explode(tokens(col(textCol))).as("__term"))
    TextDedup.withWorkingSet(tok) { tk =>
      val classTerm = tk.groupBy("__cls", "__term").agg(count(lit(1)).as("__c"))
      val classTot = tk.groupBy("__cls").agg(count(lit(1)).as("__ct"))
      val vocab = tk.select("__term").distinct().count() // 1 driver scalar
      // ONE |classes|-row collect replaces three separate docs-side
      // actions (classes distinct, per-class counts, total count): the
      // per-class doc counts are a bounded model artifact — classes,
      // nTot, and the integer micro-nat priors all derive from it
      // driver-side. StrictMath.log (fdlibm) is used instead of
      // Math.log because only StrictMath pins ONE result across JVMs
      // and JIT states (Math.log is 1-ulp-specified, and its
      // interpreted vs intrinsic paths may legally differ — a prior
      // within ~1 ulp of a 0.5 micro-nat boundary could then flip the
      // floor between runs). Oracle dependency: the hash gate
      // additionally relies on the engines' log values landing in the
      // same micro-nat cell — a practical, test-pinned agreement
      // (nb01), not an IEEE guarantee.
      val ndFrame = docs.groupBy(col(classCol).as("__cls"))
        .agg(count(lit(1)).as("__d"))
      val nd = ndFrame.collect()
      val nTot = nd.iterator.map(_.getLong(1)).sum
      val priorRows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(nd.map(r => org.apache.spark.sql.Row(
          r.get(0),
          math.floor(StrictMath.log(r.getLong(1).toDouble / nTot.toDouble) * 1e6 + 0.5)
            .toLong)): _*)
      val spark = docs.sparkSession
      val priors = spark.createDataFrame(priorRows,
        org.apache.spark.sql.types.StructType(Seq(ndFrame.schema.fields(0),
          org.apache.spark.sql.types.StructField("__prior",
            org.apache.spark.sql.types.LongType, nullable = false))))
      val classes = priors.select("__cls")
      // token occurrences × classes, scored per occurrence in micro-nats
      val occ = tk.select(col("doc_id"), col("__term"))
        .crossJoin(broadcast(classes.select(col("__cls").as("__scls"))))
      val scored = occ
        .join(classTerm,
          occ("__scls") === classTerm("__cls") && occ("__term") === classTerm("__term"),
          "left")
        .join(broadcast(classTot.select(col("__cls").as("__tcls"), col("__ct"))),
          col("__scls") === col("__tcls"))
        .select(col("doc_id"), col("__scls"),
          floor(log((coalesce(col("__c"), lit(0L)) + lit(1.0)) /
              (col("__ct") + lit(vocab)).cast("double")) * 1e6 + 0.5)
            .cast("long").as("__m"))
        .groupBy(col("doc_id"), col("__scls").as("__cls"))
        .agg(sum("__m").as("__s"))
      val total = scored.join(broadcast(priors), Seq("__cls"))
        .select(col("doc_id"), col("__cls"), (col("__s") + col("__prior")).as("score"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("__cls"))
      total.withColumn("__rk", row_number().over(w)).filter(col("__rk") === 1)
        .join(docs.select(col("doc_id"), col(classCol).as("actual")), Seq("doc_id"))
        .select(col("doc_id"), col("__cls").as("pred"),
          col("score").as("score_micro"), col("actual"),
          (col("__cls") === col("actual")).as("correct"))
    }
  }
}
