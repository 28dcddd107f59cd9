package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract-checking layer a
  * 100 TB ingest pipeline runs before publishing a batch (the
  * dbt-test/Deequ-style rule families, re-expressed as Spark
  * aggregates).
  *
  * Scale shape: every ROW-LEVEL rule (not-null, range, accepted values,
  * custom predicate) over the same table FUSES into one conditional-sum
  * aggregate — one scan, one 1-row result, however many rules. The two
  * rules that genuinely need more are priced as exactly what they are:
  * uniqueness is one keyed aggregation (the groupBy shuffle), and
  * referential integrity is one anti join (broadcast-able when the
  * parent key set is small; AQE decides). Nothing collects to the
  * driver; the report is |rules| rows.
  */
object Quality {

  /** One expectation over a table. `name` keys the report row. */
  sealed trait Rule { def name: String }

  /** `col` must never be null. */
  final case class NotNull(name: String, column: String) extends Rule

  /** `col` must fall in [lo, hi] (nulls violate — use NotNull semantics
    * deliberately: a null price is not "in range"). */
  final case class InRange(name: String, column: String, lo: Double, hi: Double)
      extends Rule

  /** `col` must be one of `values` (nulls violate). */
  final case class AcceptedValues(name: String, column: String, values: Seq[String])
      extends Rule

  /** Arbitrary row predicate; a row violates when the predicate is NOT
    * true (false OR null — SQL three-valued logic made explicit). */
  final case class Check(name: String, predicate: Column) extends Rule

  /** The key columns must be unique. Violations = rows beyond the first
    * in each duplicated key group (so a clean table reports 0 and a
    * fully-duplicated pair reports 1). */
  final case class Unique(name: String, columns: Seq[String]) extends Rule

  /** Every non-null child key must exist in the parent key set (standard
    * SQL FK semantics: null child keys are exempt — pair with NotNull if
    * they should not be). */
  final case class ForeignKey(name: String, childColumn: String,
      parent: DataFrame, parentColumn: String) extends Rule

  /** Evaluate `rules` against `df` → one report row per rule:
    * (rule, violations, total, pass). `total` is the table row count
    * (for ForeignKey: the child table's).
    */
  def expectations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "expectations needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"rule names must be unique, got ${rules.map(_.name).mkString(", ")}")

    def violatedWhen(c: Column): Column = sum(when(c, 1L).otherwise(0L))

    val rowLevel: Seq[(String, Column)] = rules.collect {
      case NotNull(n, c) => n -> violatedWhen(col(c).isNull)
      case InRange(n, c, lo, hi) =>
        n -> violatedWhen(!(col(c) >= lo && col(c) <= hi) || col(c).isNull)
      case AcceptedValues(n, c, vs) =>
        n -> violatedWhen(!col(c).isInCollection(vs) || col(c).isNull)
      case Check(n, p) => n -> violatedWhen(!(p <=> true))
    }

    // All row-level rules ride ONE aggregate over one scan. The 1-row
    // aggregate is EXPLODED into per-rule report rows — a union of
    // per-rule projections would re-plan (and re-scan for) the whole
    // aggregate once per branch, which is exactly the pr01 lesson.
    val fused: Option[DataFrame] = if (rowLevel.isEmpty) None else Some {
      val aggs = rowLevel.map { case (n, c) => c.as(s"v_$n") } :+
        count(lit(1)).as("__total")
      val one = df.agg(aggs.head, aggs.tail: _*)
      val pairs = rowLevel.map { case (n, _) =>
        struct(lit(n).as("rule"), col(s"v_$n").as("violations"))
      }
      one.select(explode(array(pairs: _*)).as("kv"), col("__total").as("total"))
        .select(col("kv.rule").as("rule"), col("kv.violations").as("violations"),
          col("total"))
    }

    val keyed: Seq[DataFrame] = rules.collect {
      case Unique(n, cs) =>
        val dup = df.groupBy(cs.map(col): _*).agg(count(lit(1)).as("__n"))
        dup.agg(
          coalesce(sum(col("__n") - 1L), lit(0L)).as("violations"),
          coalesce(sum(col("__n")), lit(0L)).as("total"))
          .select(lit(n).as("rule"), col("violations"), col("total"))
      case ForeignKey(n, childCol, parent, parentCol) =>
        // Rename the parent key before joining: in the common FK case the
        // child and parent columns share a name (both `order_id`), and
        // `col(name) === col(name)` would be ambiguous on both sides.
        val orphans = df.filter(col(childCol).isNotNull)
          .join(parent.select(col(parentCol).as("__parent_key")).distinct(),
            col(childCol) === col("__parent_key"), "left_anti")
          .agg(count(lit(1)).as("violations"))
        orphans.crossJoin(df.agg(count(lit(1)).as("total")))
          .select(lit(n).as("rule"), col("violations"), col("total"))
    }

    (fused.toSeq ++ keyed)
      .reduce(_ unionAll _)
      .withColumn("pass", col("violations") === 0L)
  }

  /** Quarantine routing: split a table by a fused row-level predicate
    * (the union of the given row rules) into (clean, quarantined) — the
    * write-side companion to [[expectations]]. One scan feeds both
    * branches when the caller materializes the tagged frame; here we
    * return the tagged frame so the caller controls materialization
    * (the working-set discipline).
    *
    * @return input + `__violated` boolean (true = quarantine)
    */
  def tagViolations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val preds: Seq[Column] = rules.collect {
      case NotNull(_, c) => col(c).isNull
      case InRange(_, c, lo, hi) => !(col(c) >= lo && col(c) <= hi) || col(c).isNull
      case AcceptedValues(_, c, vs) => !col(c).isInCollection(vs) || col(c).isNull
      case Check(_, p) => !(p <=> true)
    }
    require(preds.size == rules.size,
      "tagViolations accepts row-level rules only (NotNull/InRange/AcceptedValues/Check); " +
        "Unique/ForeignKey need their own pass — run expectations for those")
    df.withColumn("__violated", preds.reduce(_ || _))
  }
}
