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

  /** Salted equi-join for skewed keys: the fact side's hot key is split
    * across `buckets` sub-keys by a deterministic per-row salt, and the
    * dim side is replicated once per salt value, so one hot key's rows
    * spread over `buckets` reducers instead of one straggler. The result
    * is row-identical to the plain join for ANY salt assignment — the
    * salt only routes rows. (AQE's skew-join split does this at runtime
    * for sort-merge joins; the manual form also covers hash-partitioned
    * shuffles and pre-AQE plans, and makes the technique testable against
    * the unsalted oracle.) Cost: dim side ships `buckets`× — use for a
    * skewed FACT against a small-but-not-broadcastable dim.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factSalt: Column, buckets: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(factSalt, lit(buckets)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
