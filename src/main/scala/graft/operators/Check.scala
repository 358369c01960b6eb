package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the validation gate a production table
  * runs before anything downstream trusts it (the Delta-constraints /
  * Deequ shape re-expressed as plain aggregates): declare rules as
  * boolean Columns, get back either the per-rule violation tally
  * ([[audit]] — the monitoring surface) or the offending rows tagged
  * with what they violated ([[quarantine]] — the triage surface).
  *
  * Null semantics are strict: a rule evaluating to NULL (the classic
  * silent hole in `WHERE`-based checks — a null never fails a filter)
  * counts as a VIOLATION. `coalesce(rule, false)` on every predicate
  * makes that explicit and portable.
  *
  * Scale shape: [[audit]] is ONE pass — every rule becomes a
  * conditional count in a single global aggregate (map-side partials,
  * one 1-row result), then a literal-backed unpivot to one row per
  * rule; rule cardinality is code-sized, never data-sized.
  * [[quarantine]] is a pure codegen'd projection + filter — no
  * shuffle, no UDF, whole-stage fused with the scan.
  */
object Check {

  private def failed(rule: Column): Column = !coalesce(rule, lit(false))

  /** Per-rule violation tally over one scan: (rule, n_rows,
    * n_violations, violation_frac), one row per rule in declaration
    * order. */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_._1)}")
    val aggs = count(lit(1)).as("_n") +:
      rules.map { case (name, rule) =>
        sum(when(failed(rule), 1L).otherwise(0L)).as(s"_v_$name")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val long = rules.map { case (name, _) =>
      struct(lit(name).as("rule"), col(s"_v_$name").as("n_violations"))
    }
    wide
      .select(col("_n"), explode(array(long: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("_n").as("n_rows"),
        col("r.n_violations").as("n_violations"),
        round(col("r.n_violations") / col("_n"), 6).as("violation_frac"))
      .orderBy("rule")
  }

  /** Rows failing ANY rule, tagged with the comma-joined names of every
    * rule they violate (declaration order) in `failed_rules`. Clean
    * rows are absent; anti-join on the caller's key for the clean
    * side. */
  def quarantine(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "quarantine needs at least one rule")
    val tags = rules.map { case (name, rule) =>
      when(failed(rule), lit(name))
    }
    df.withColumn("failed_rules",
        concat_ws(",", tags: _*)) // concat_ws skips the NULL (passing) tags
      .filter(col("failed_rules") =!= "")
  }
}
