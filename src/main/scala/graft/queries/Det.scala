package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers shared by every `SparkEntry.queries` entry.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL. Two rules make that comparison exact rather than "usually
  * close":
  *
  *   - double sums are order-dependent (Spark combines partial aggregates
  *     in nondeterministic partition order; DuckDB sums sequentially), so
  *     every SUM over a double goes through an exact DECIMAL(18,6)
  *     accumulator and is cast back to double. Oracle SQL mirrors the
  *     same cast, so both engines produce bit-identical doubles.
  *   - every query ends in a total ORDER BY over unique key columns, so
  *     row order is deterministic on both sides.
  */
object Det {
  /** Exact, order-independent sum of a double column (see above).
    * Scale 6 because every money column has ≤2 decimal digits, so any
    * product of up to three of them has ≤6 — the scaled value is then an
    * exact integer and the double→decimal cast can never land on a
    * rounding midpoint (which Spark and DuckDB break differently). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Oracle-side spelling of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE)"
}
