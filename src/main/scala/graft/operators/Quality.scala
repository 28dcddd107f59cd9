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

    require(rowLevel.size + keyed.size == rules.size,
      "expectations handles NotNull/InRange/AcceptedValues/Check/Unique/ForeignKey; " +
        "suite-scoped rules (ForeignKeyRef, CountRatio) need Quality.suite to resolve " +
        "their table references — passing them here would silently drop them")

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

  /** [[ForeignKey]] with the parent resolved BY SUITE TABLE NAME — the
    * declarative form a multi-table [[suite]] spec wants (no DataFrame
    * handles inside the rule list). */
  final case class ForeignKeyRef(name: String, childColumn: String,
      parentTable: String, parentColumn: String) extends Rule

  /** Cross-table row-count reconciliation: this table must hold at
    * least `minRatio` × |otherTable| rows (ingest-completeness checks —
    * "every order produced at least N lineitems on average", "today's
    * batch is not mysteriously half-empty vs the dimension").
    * Violations = rows short of the floor: max(0, ⌈minRatio·|other|⌉ − |this|). */
  final case class CountRatio(name: String, otherTable: String, minRatio: Double)
      extends Rule

  /** Rules for one table of a [[suite]] spec. */
  final case class TableRules(table: String, rules: Seq[Rule])

  /** Compile a MULTI-TABLE expectation suite into one fused report —
    * the dq02 surface: (table, rule, violations, total, pass), one row
    * per rule across every table.
    *
    * The compile step is where the scale shape is enforced, per table:
    * all row-level rules still fuse into ONE conditional-sum scan
    * ([[expectations]]); [[ForeignKeyRef]] resolves its parent from the
    * suite's table map (anti join, broadcast-able); [[CountRatio]]
    * rides 1-row count aggregates computed ONCE per referenced table
    * however many ratio rules touch it (parquet count(*) is a
    * metadata-only scan), combined by 1-row cross joins. Nothing
    * collects; the report is Σ|rules| rows.
    */
  def suite(tables: Map[String, DataFrame], spec: Seq[TableRules]): DataFrame = {
    require(spec.nonEmpty, "suite needs at least one table's rules")
    require(spec.map(_.table).distinct.size == spec.size,
      s"duplicate table entries in suite: ${spec.map(_.table).mkString(", ")}")
    spec.foreach(tr => require(tables.contains(tr.table),
      s"suite references unknown table '${tr.table}' — known: ${tables.keys.mkString(", ")}"))
    spec.foreach(tr => require(tr.rules.nonEmpty,
      s"suite table '${tr.table}' has no rules — drop the entry or add rules"))
    val allNames = spec.flatMap(_.rules.map(_.name))
    require(allNames.distinct.size == allNames.size,
      s"rule names must be unique across the whole suite, got ${allNames.mkString(", ")}")
    // 1-row count frames, one per table any CountRatio touches
    val countedTables = spec.flatMap { tr =>
      tr.rules.collect { case CountRatio(_, other, _) => other } ++
        (if (tr.rules.exists(_.isInstanceOf[CountRatio])) Seq(tr.table) else Nil)
    }.distinct
    countedTables.foreach(t => require(tables.contains(t),
      s"CountRatio references unknown table '$t' — known: ${tables.keys.mkString(", ")}"))
    val counts: Map[String, DataFrame] =
      countedTables.map(t => t -> tables(t).agg(count(lit(1)).as("__cnt"))).toMap
    val reports: Seq[DataFrame] = spec.map { tr =>
      val (ratios, direct) = tr.rules.partition(_.isInstanceOf[CountRatio])
      val resolved = direct.map {
        case ForeignKeyRef(n, c, pt, pc) =>
          require(tables.contains(pt),
            s"ForeignKeyRef '$n' references unknown parent table '$pt'")
          ForeignKey(n, c, tables(pt), pc)
        case r => r
      }
      val base = if (resolved.isEmpty) Nil
        else Seq(expectations(tables(tr.table), resolved))
      val ratioReports = ratios.collect { case CountRatio(n, other, minRatio) =>
        require(minRatio > 0, s"CountRatio '$n' needs minRatio > 0, got $minRatio")
        counts(tr.table).select(col("__cnt").as("__cnt_this"))
          .crossJoin(counts(other).select(col("__cnt").as("__cnt_other")))
          .select(lit(n).as("rule"),
            greatest(lit(0L), ceil(lit(minRatio) * col("__cnt_other")).cast("long")
              - col("__cnt_this")).as("violations"),
            col("__cnt_this").as("total"))
          .withColumn("pass", col("violations") === 0L)
      }
      (base ++ ratioReports).map(_.select(lit(tr.table).as("table"),
        col("rule"), col("violations"), col("total"), col("pass")))
        .reduce(_ unionAll _)
    }
    reports.reduce(_ unionAll _)
  }

  /** k-anonymity audit: the quasi-identifier combinations shared by
    * FEWER than `k` rows — the re-identification risk cells a privacy
    * review needs before a dataset (or its aggregate release) ships.
    * Continuous quasi-identifiers must be binned upstream (the
    * generalization step of anonymization — passing raw uniques makes
    * every row a violation, which this reports faithfully).
    *
    * Scale shape: ONE hash aggregate keyed on the quasi-identifier
    * tuple (map-side partial combine), then the k filter — output
    * bounded by the violating-cell count. Nothing collects.
    *
    * @return (quasiCols*, n) for cells with 0 < n < k */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
                           k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityViolations needs quasi-identifier columns")
    require(k >= 2, s"k=$k is not a meaningful anonymity threshold (k >= 2)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }
}
