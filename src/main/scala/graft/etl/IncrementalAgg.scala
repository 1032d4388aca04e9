package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance (IVM for the moment family): keep a
  * per-group (count, Σv, Σv²) state table in sync with an upserted base
  * table by RETRACTING the replaced rows' contributions and ADDING the
  * delta's — O(|delta|) work per refresh where a recompute pays
  * O(|table|), the difference between a dashboard that refreshes in
  * seconds and one that rescans 100 TB nightly. The maintained moments
  * serve mean/variance/stddev and feed the analytics family (q77's
  * stats, q105's z-scores) without touching the base table.
  *
  * Correctness hinges on EXACT arithmetic: retraction must be the exact
  * inverse of addition, so contributions accumulate in DECIMAL — a
  * floating-point state would drift by one ulp per retraction and the
  * state would diverge from the recompute it claims to equal
  * (IncrementalAggSpec pins state == recompute after every round).
  * Deletions retract to n = 0 and the group row drops, matching the
  * recompute exactly.
  *
  * Scale shape: contributions aggregate the DELTA only (delta-sized
  * shuffle on the group key), the merge is one outer equi-join against
  * the state table on the same key, and the state is groups-sized.
  * Replaced-row retrieval is a semi-join of the PREVIOUS snapshot
  * version against the delta's pks — the only base-table touch, prunable
  * by the same key predicates at 100 TB.
  */
object IncrementalAgg {
  private val D = DecimalType(27, 6)

  /** Full recompute — the bootstrap state and the validation reference. */
  def compute(df: DataFrame, key: String, value: String): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        sum(col(value).cast(D)).as("s"),
        sum((col(value) * col(value)).cast(D)).as("q"))

  private def signed(rows: DataFrame, key: String, value: String,
                     sign: Int): DataFrame =
    compute(rows, key, value)
      .select(col(key), (col("n") * sign).as("dn"),
        (col("s") * sign).as("ds"), (col("q") * sign).as("dq"))

  /** `state` advanced by one refresh: `removed` rows retract (the
    * previous version's rows whose pks the delta replaces or deletes),
    * `added` rows contribute. Groups retracting to zero rows drop.
    */
  def advance(state: DataFrame, removed: DataFrame, added: DataFrame,
              key: String, value: String): DataFrame = {
    val delta = signed(removed, key, value, -1)
      .unionByName(signed(added, key, value, 1))
      .groupBy(col(key))
      .agg(sum(col("dn")).as("dn"), sum(col("ds")).as("ds"),
        sum(col("dq")).as("dq"))
    state.join(delta, Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n"),
        (coalesce(col("s"), lit(0).cast(D))
          + coalesce(col("ds"), lit(0).cast(D))).cast(D).as("s"),
        (coalesce(col("q"), lit(0).cast(D))
          + coalesce(col("dq"), lit(0).cast(D))).cast(D).as("q"))
      .filter(col("n") > 0)
  }

  /** The replaced rows a refresh must retract: the previous version's
    * rows whose pk appears in the delta (updates) or in `deletedPks`
    * (explicit deletions). */
  def replacedRows(previous: DataFrame, delta: DataFrame, pk: String,
                   deletedPks: DataFrame = null): DataFrame = {
    val touched = if (deletedPks == null) delta.select(col(pk))
      else delta.select(col(pk)).unionByName(deletedPks.select(col(pk)))
    previous.join(touched.distinct(), Seq(pk), "left_semi")
  }

  /** Derived readout: mean/variance from the maintained moments. */
  def stats(state: DataFrame, key: String): DataFrame = {
    val n = col("n").cast("double")
    val mean = col("s").cast("double") / n
    state.select(col(key), col("n"), mean.as("mean"),
      when(col("n") > 1,
        (col("q").cast("double") - col("s").cast("double") * mean)
          / (n - lit(1.0))).as("variance"))
  }
}
