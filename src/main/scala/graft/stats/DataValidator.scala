package graft.stats

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{AlgoOperator, StageLoader}
import graft.param._
import graft.util.ReadWrite

/**
 * Declarative data-quality validation (the deequ/Great-Expectations
 * role): a check list evaluated against a table, one result row per
 * check — `(check, target, violations, total, pass)` — so a pipeline
 * can gate ingestion on `pass` and alert on the violation counts.
 * Checks:
 *
 *  - `addNotNull(col)` — null values are violations;
 *  - `addInRange(col, lo, hi)` — values outside [lo, hi] (nulls
 *    violate: a null is not known to be in range);
 *  - `addMatches(col, regex)` — values not fully matching (RLIKE
 *    semantics, i.e. the regex may match anywhere unless anchored);
 *  - `addInSet(col, v1, v2, ...)` — values outside the allowed set;
 *  - `addSatisfies(name, sqlPredicate)` — rows where an arbitrary SQL
 *    boolean expression is false or null;
 *  - `addUnique(col)` — rows carrying a value that occurs more than
 *    once (a value seen 3× contributes 3 violations).
 *
 * Scale shape: every ROW-LEVEL check compiles to a conditional-sum
 * aggregate and ALL of them run in ONE scan + one global aggregation
 * (no shuffle of the fact table — partial aggregation reduces each
 * partition to one row of counters). Each `unique` check adds one
 * map-side-combinable groupBy on its column — the unavoidable shuffle
 * for a distinctness question, bounded by the distinct-value count.
 *
 * Checks persist as strings (tab-separated fields) through the
 * standard param save/load, so a validation suite is a saveable stage
 * like any other.
 */
class DataValidator extends AlgoOperator[DataValidator] {

  final val checks: Param[Array[String]] = param[Array[String]](
    "checks", "Encoded check list (kind\\tfield\\targs...)", Array.empty[String])
  def getChecks: Array[String] = get(checks)
  def setChecks(v: Array[String]): DataValidator = set(checks, v)

  private def add(parts: String*): DataValidator =
    set(checks, getChecks :+ parts.mkString("\t"))

  def addNotNull(col: String): DataValidator = add("not_null", col)
  def addInRange(col: String, lo: Double, hi: Double): DataValidator =
    add("in_range", col, lo.toString, hi.toString)
  def addMatches(col: String, regex: String): DataValidator =
    add("matches", col, regex)
  def addInSet(col: String, values: String*): DataValidator =
    add(Seq("in_set", col) ++ values: _*)
  def addSatisfies(name: String, predicate: String): DataValidator =
    add("satisfies", name, predicate)
  def addUnique(col: String): DataValidator = add("unique", col)

  /** One row per check: (check, target, violations, total, pass). */
  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val df = inputs.head
    val parsed = getChecks.map(_.split("\t", -1).toSeq)
    require(parsed.nonEmpty, "DataValidator: no checks added")

    // row-level checks: one conditional count each, all in ONE agg pass
    def violation(kind: String, args: Seq[String]): Option[Column] = kind match {
      case "not_null" => Some(col(args.head).isNull)
      case "in_range" =>
        val c = col(args.head).cast("double")
        Some(c.isNull || c < args(1).toDouble || c > args(2).toDouble)
      case "matches" => Some(!coalesce(col(args.head).rlike(args(1)), lit(false)))
      case "in_set" =>
        val allowed = array(args.tail.map(lit(_)): _*)
        Some(!coalesce(array_contains(allowed, col(args.head).cast("string")), lit(false)))
      case "satisfies" => Some(!coalesce(expr(args(1)), lit(false)))
      case "unique" => None
      case other => throw new IllegalArgumentException(s"unknown check kind: $other")
    }

    val rowChecks = parsed.zipWithIndex.flatMap { case (kindArgs, i) =>
      violation(kindArgs.head, kindArgs.tail)
        .map(v => (i, kindArgs.head, kindArgs(1),
          sum(when(v, 1L).otherwise(0L)).as(s"__v$i")))
    }
    val spark = df.sparkSession
    import spark.implicits._

    val rowResults: Seq[(Int, String, String, Long, Long)] =
      if (rowChecks.isEmpty) Seq.empty
      else {
        val aggs = rowChecks.map(_._4) :+ count(lit(1)).as("__total")
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        val total = r.getLong(rowChecks.length)
        rowChecks.zipWithIndex.map { case ((i, kind, field, _), j) =>
          (i, kind, field, r.getLong(j), total)
        }
      }

    // uniqueness checks: one groupBy each; violations = rows whose
    // value occurs > 1 time (nulls exempt — use not_null to forbid them)
    val uniqueResults: Seq[(Int, String, String, Long, Long)] =
      parsed.zipWithIndex.collect { case (kindArgs, i) if kindArgs.head == "unique" =>
        val field = kindArgs(1)
        val r = df.where(col(field).isNotNull)
          .groupBy(col(field)).agg(count(lit(1)).as("n"))
          .agg(coalesce(sum(when(col("n") > 1, col("n")).otherwise(0L)), lit(0L)),
            coalesce(sum("n"), lit(0L))).head()
        (i, "unique", field, r.getLong(0), r.getLong(1))
      }

    val out = (rowResults ++ uniqueResults).sortBy(_._1)
      .map { case (i, kind, field, v, total) =>
        (s"${i + 1}_$kind", field, v, total, v == 0L)
      }
    Array(out.toDF("check", "target", "violations", "total", "pass"))
  }

  /** True iff every check passes — the gate expression. */
  def validate(input: DataFrame): Boolean =
    transform(input).head.agg(min("pass")).head().getBoolean(0)
}

object DataValidator extends StageLoader[DataValidator] {
  def load(spark: SparkSession, path: String): DataValidator =
    ReadWrite.applyParams(new DataValidator, path)
}
