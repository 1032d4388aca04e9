package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-deterministic aggregation helpers.
  *
  * The DuckDB oracle and Spark may sum floating-point columns in different
  * orders (different partitioning / morsel order), so a plain `sum(double)`
  * can differ in the low bits and fail the driver's hash compare. The fix:
  * per-row double arithmetic is IEEE-754-deterministic (same inputs, same
  * result in both engines); casting each row to a decimal and summing decimals
  * is exact and therefore order-independent. The final cast back to double is
  * deterministic again. Oracle-side twin:
  * `CAST(SUM(CAST(x AS DECIMAL(27,4))) AS DOUBLE)`.
  */
object Fns {
  /** Order-independent exact sum of a double expression. Scale 6 because the
    * fixtures carry 2-decimal money values: a triple product (price ×
    * discount × tax factors) has at most 6 true decimals, so the per-row
    * decimal cast is exact in both engines — no round-half boundary to
    * disagree on.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(27, 6))).cast(DoubleType)

  /** Oracle SQL fragment mirroring [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(27,6))) AS DOUBLE)"

  /** [[dsum]] at scale 18, for summands far below 1 (probability masses,
    * per-edge rank contributions ~1e-6..1e-9) where a 6-decimal cast would
    * destroy the signal. Same determinism argument: a dyadic double never
    * sits exactly on a 10^-18 half boundary (the boundary carries a factor
    * 5^-18), so both engines round each row identically and the decimal
    * sum is order-independent.
    */
  def dsum18(c: Column): Column =
    sum(c.cast(DecimalType(38, 18))).cast(DoubleType)

  /** Oracle SQL fragment mirroring [[dsum18]]. */
  def dsum18Sql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(38,18))) AS DOUBLE)"

  /** Bit-exact cross-engine average: exact decimal sum → double → one IEEE
    * division by the group count. Both engines produce the identical double,
    * so no rounding is needed (a `round(avg(x), n)` can land exactly on a
    * half boundary — e.g. sum/24 — where the engines' rounding methods
    * disagree).
    */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Oracle SQL fragment mirroring [[davg]]. */
  def davgSql(expr: String): String = s"(${dsumSql(expr)} / COUNT(*))"
}
