package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of declared queries plus their DuckDB oracle SQL.
  * `SparkEntry` aggregates all modules; keys must be globally unique.
  * Every query must be deterministic: literal as-of timestamps (never
  * `now()` — fixing the reference's `NOW()`-relative reads,
  * `pyopenetl/operations.py:539`), a total trailing ORDER BY, and
  * order-independent float aggregation (see [[Fns.dsum]]).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
