package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Skew-mitigation utilities for hot grouping keys (builder contract:
  * "skewed keys → salting or AQE skew-join"). AQE rebalances skewed
  * *joins* automatically; a skewed *aggregation* on a hot key still funnels
  * every row of that key through one reducer's hash-map bucket. Salting
  * splits each key into `saltBuckets` sub-keys, aggregates partials, then
  * re-aggregates the partials — the hot key's rows spread over
  * `saltBuckets` tasks.
  *
  * (For plain built-in aggregates Spark's partial aggregation already
  * combines map-side, which usually suffices; salting matters when the
  * aggregation state is per-key-heavy — large decimal sums, collect-style
  * buffers, sketches — or when a later stage keys on the hot column.)
  */
object Skew {

  /** Two-phase salted sum/count. The per-row value is cast to decimal so
    * both phases re-aggregate exactly (order-independent — same contract as
    * [[graft.Fns.dsum]]). `salt` must be a deterministic per-row expression
    * (e.g. `pmod(col("pk"), n)`); any assignment yields the same result,
    * determinism just keeps retried tasks identical.
    */
  def saltedSumCount(df: DataFrame, key: Column, keyName: String,
                     valueCol: Column, salt: Column): DataFrame =
    df.withColumn("__salt", salt)
      .groupBy(key.as(keyName), col("__salt"))
      .agg(
        sum(valueCol.cast(DecimalType(27, 6))).as("__psum"),
        count(lit(1)).as("__pcnt"))
      .groupBy(col(keyName))
      .agg(
        sum(col("__psum")).cast(DoubleType).as("sum_value"),
        sum(col("__pcnt")).as("n_rows"))
}
