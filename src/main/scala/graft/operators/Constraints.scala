package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ/`CHECK`-constraint
  * shape a training-data pipeline gates its lake commits on): a set of
  * constraints over one table is compiled into a SINGLE aggregation pass —
  * one job, map-side partial aggregation, no per-constraint scans — and the
  * result comes back long-form, one row per constraint with the measured
  * metric and its pass/fail verdict.
  *
  * Scale notes: everything except uniqueness folds into plain aggregates
  * (avg/min/max/count over codegen'd CASE expressions). Uniqueness needs a
  * distinct count; it rides the SAME pass via Spark's Expand-based
  * multi-distinct aggregation (one scan, expand factor = distinct groups),
  * which is the standard engine answer — never a second job. At 100 TB a
  * suite of 20 constraints still costs exactly one table scan.
  */
object Constraints {

  sealed trait Constraint {
    /** Stable row key in the result frame. */
    def name: String
  }

  /** Null fraction of `column` must be ≤ `maxNullFraction`. */
  final case class NotNull(column: String, maxNullFraction: Double = 0.0)
      extends Constraint {
    def name = s"not_null($column)"
  }

  /** `columns` must be a unique key (duplicate fraction 0). */
  final case class Unique(columns: Seq[String]) extends Constraint {
    def name = s"unique(${columns.mkString(",")})"
  }

  /** Non-null values of `column` must lie in [lo, hi]; metric = fraction of
    * violating rows. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Constraint {
    def name = s"in_range($column)"
  }

  /** Non-null values of `column` must be one of `values`. */
  final case class AcceptedValues(column: String, values: Seq[String])
      extends Constraint {
    def name = s"accepted_values($column)"
  }

  /** Non-null values of `column` must match `pattern` (Java regex, full
    * match) in at least `minFraction` of rows. */
  final case class MatchesRegex(column: String, pattern: String,
      minFraction: Double = 1.0) extends Constraint {
    def name = s"matches_regex($column)"
  }

  /** Table must have at least `minRows` rows. */
  final case class MinSize(minRows: Long) extends Constraint {
    def name = "min_size"
  }

  /** Compile the suite into one aggregation pass and return the long-form
    * verdict frame: `(constraint string, metric double, ok boolean)`,
    * ordered by constraint name. Metrics are fractions (6 dp) except
    * `min_size`, whose metric is the row count.
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "empty constraint suite")
    val dupNames = constraints.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupNames.isEmpty,
      s"duplicate constraint names: ${dupNames.mkString(", ")}")
    val n = count(lit(1))
    // On an EMPTY table every fraction metric is vacuously 0 (no violating
    // rows), never null — only min_size can fail. avg() over zero rows
    // returns null, so fraction metrics coalesce to 0.0; the unique ratio
    // divides by a guarded count.
    def frac(c: Column): Column = coalesce(round(avg(c), 6), lit(0.0))
    // (aggregate expression producing the metric, metric => ok predicate)
    val compiled: Seq[(String, Column, Column => Column)] = constraints.map {
      case c @ NotNull(col0, maxF) =>
        (c.name,
          frac(when(col(col0).isNull, 1.0).otherwise(0.0)),
          m => m <= maxF)
      case c @ Unique(cols) =>
        // duplicate fraction = 1 - distinct/count; distinct over a struct so
        // multi-column keys count as tuples (null components group as in
        // GROUP BY — two (1, null) rows ARE duplicates of each other)
        (c.name,
          when(n === 0, lit(0.0)).otherwise(round(lit(1.0) -
            count_distinct(struct(cols.map(col): _*)) / n, 6)),
          m => m === 0.0)
      case c @ InRange(col0, lo, hi) =>
        (c.name,
          frac(when(col(col0).isNotNull &&
            (col(col0) < lo || col(col0) > hi), 1.0).otherwise(0.0)),
          m => m === 0.0)
      case c @ AcceptedValues(col0, vals) =>
        (c.name,
          frac(when(col(col0).isNotNull &&
            !col(col0).isin(vals: _*), 1.0).otherwise(0.0)),
          m => m === 0.0)
      case c @ MatchesRegex(col0, pat, minF) =>
        // a match FRACTION is vacuously compliant on zero rows (1.0), unlike
        // the violation fractions above which are vacuously 0
        (c.name,
          coalesce(round(avg(when(col(col0).isNotNull &&
            col(col0).rlike(pat), 1.0).otherwise(0.0)), 6), lit(1.0)),
          m => m >= minF)
      case c @ MinSize(minRows) =>
        (c.name, n.cast("double"), m => m >= minRows.toDouble)
    }
    // one wide agg row, then explode long-form: inline preserves one source
    // scan and produces (constraint, metric) pairs without a shuffle
    val aggs = compiled.map { case (nm, expr, _) => expr.as(s"m_$nm") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val pairs = array(compiled.map { case (nm, _, okFn) =>
      struct(lit(nm).as("constraint"),
        col(s"m_$nm").as("metric"),
        okFn(col(s"m_$nm")).as("ok"))
    }: _*)
    wide.select(inline(pairs)).orderBy(col("constraint"))
  }
}
