package graft.etl

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVM invariant: after every refresh, the incrementally-maintained
  * moment state must equal a full recompute of the new table version —
  * bit-for-bit, which is exactly what the decimal contributions buy
  * (retraction is the exact inverse of addition).
  */
class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val pk = "o_orderkey"
  private val key = "o_orderstatus"
  private val value = "o_totalprice"

  private def canon(df: DataFrame): Set[(String, Long, BigDecimal, BigDecimal)] =
    df.collect().map(r => (r.getString(0), r.getLong(1),
      BigDecimal(r.getDecimal(2)), BigDecimal(r.getDecimal(3)))).toSet

  test("incremental state tracks upserts and deletes across rounds") {
    val v0 = Tables.t(spark, TestSpark.Sf, "orders")
      .select(col(pk), col(key), col(value))
    var state = IncrementalAgg.compute(v0, key, value)

    // round 1: update a third of the rows (price bump), insert new pks
    val updates = v0.filter(col(pk) % 3 === 0)
      .withColumn(value, col(value) * 1.1)
    val inserts = v0.filter(col(pk) % 7 === 0)
      .select((col(pk) + 1000000).as(pk), col(key),
        (col(value) + 5.0).as(value))
    val delta1 = updates.unionByName(inserts)
    val v1 = UpsertKernel.merge(v0, delta1, pk)
    state = IncrementalAgg.advance(state,
      IncrementalAgg.replacedRows(v0, delta1, pk), delta1, key, value)
    assert(canon(state) == canon(IncrementalAgg.compute(v1, key, value)),
      "state after round 1 must equal the recompute")

    // round 2: more updates plus explicit deletions
    val delta2 = v1.filter(col(pk) % 5 === 1)
      .withColumn(value, col(value) * 0.5)
    val deleted = v1.filter(col(pk) % 11 === 2).select(col(pk))
    val v2 = UpsertKernel.merge(v1, delta2, pk)
      .join(deleted, Seq(pk), "left_anti")
    val removed2 = IncrementalAgg.replacedRows(v1, delta2, pk, deleted)
    // deleted rows retract without re-adding: drop deleted pks from delta
    val added2 = delta2.join(deleted, Seq(pk), "left_anti")
    state = IncrementalAgg.advance(state, removed2, added2, key, value)
    assert(canon(state) == canon(IncrementalAgg.compute(v2, key, value)),
      "state after deletions must equal the recompute")

    // a group deleted entirely must vanish from the state
    val only = v2.select(col(key)).distinct().count()
    assert(state.count() == only)
  }

  test("stats readout derives mean/variance from the moments") {
    val v0 = Tables.t(spark, TestSpark.Sf, "orders")
      .select(col(pk), col(key), col(value))
    val st = IncrementalAgg.stats(IncrementalAgg.compute(v0, key, value), key)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val ref = v0.collect().map(r => (r.getString(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    st.foreach { case (k2, (n, mean, variance)) =>
      val xs = ref(k2)
      assert(n == xs.length.toLong)
      assert(math.abs(mean - xs.sum / xs.length) < 1e-6)
      val m = xs.sum / xs.length
      val v = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      // relative: the moment form cancels two ~1e12 terms, the reference
      // sums centered squares — both double-rounded differently
      assert(math.abs(variance - v) <= 1e-6 * math.abs(v) + 1e-6,
        s"$k2: $variance vs $v")
    }
  }
}
