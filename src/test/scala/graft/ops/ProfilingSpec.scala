package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force checks of the data-quality/profiling family (q186–q189)
  * against sequential replays of the same rules.
  */
class ProfilingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private lazy val orders = Tables.t(spark, TestSpark.Sf, "orders")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))

  test("q186 diff counts match the derivation rules exactly") {
    val keys = orders.map(_._1)
    val removed = keys.count(_ % 97 == 0).toLong
    val added = keys.count(_ % 31 == 0).toLong
    val changed = orders.count(o => o._1 % 97 != 0 && o._1 % 13 == 0 &&
      o._4 * 1.1 != o._4).toLong
    val unchanged = keys.length - removed - changed
    val got = q("q186_table_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.getOrElse("removed", 0L) == removed)
    assert(got.getOrElse("added", 0L) == added)
    assert(got.getOrElse("changed", 0L) == changed)
    assert(got.getOrElse("unchanged", 0L) == unchanged)
  }

  test("q187 audit reports zero orphans on the FK-consistent fixture") {
    val rows = q("q187_ri_audit").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L, s"${r.getString(0)} has orphans")
      assert(r.getDouble(3) == 0.0)
      assert(r.getLong(1) > 0L)
    }
  }

  test("q188 verdicts equal a brute-force dependency check") {
    val byKey = orders.groupBy(_._1)
    assert(byKey.forall(_._2.map(_._2).distinct.length == 1),
      "pk determines custkey in the fixture")
    val custStatus = orders.groupBy(_._2).exists(
      _._2.map(_._3).distinct.length > 1)
    val got = q("q188_fd_audit").collect()
      .map(r => r.getString(0) -> ((r.getBoolean(3), r.getLong(4)))).toMap
    assert(got("o_orderkey->o_custkey")._1, "pk FD must hold")
    assert(got("c_custkey->c_nationkey")._1, "customer FD must hold")
    assert(got("o_custkey->o_orderstatus")._1 == !custStatus)
    got.values.foreach { case (_, fanout) => assert(fanout >= 1L) }
  }

  test("q193 as-of join equals a sequential per-user replay") {
    val orders2 = Tables.t(spark, TestSpark.Sf, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 +
          (r.getTimestamp(2).getNanos / 1000) % 1000))
    val purchases = Tables.t(spark, TestSpark.Sf, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 +
          (r.getTimestamp(2).getNanos / 1000) % 1000))
    val byUser = orders2.groupBy(_._1)
    val expected = purchases.map { case (eid, u, us) =>
      // kind sorts orders before events at equal timestamps, so any
      // order with ous <= us is visible to the event
      val cands = byUser.getOrElse(u, Array()).filter(o => o._3 <= us)
      eid -> (if (cands.isEmpty) None
        else Some(cands.maxBy(o => (o._3, o._2))._2))
    }.toMap
    val got = SparkEntry.queries("q193_asof_join")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == expected)
    assert(got.values.flatten.nonEmpty, "some purchases must match orders")
  }

  test("q194 SCD2 intervals are contiguous runs covering every order") {
    val got = SparkEntry.queries("q194_scd2_build")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5)))
    val orders2 = Tables.t(spark, TestSpark.Sf, "orders").count()
    assert(got.map(_._6).sum == orders2,
      "every order belongs to exactly one interval")
    got.groupBy(_._1).foreach { case (cust, ivs) =>
      val sorted = ivs.sortBy(_._2).toSeq
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"$cust versions must be dense from 1")
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._5.contains(b._4), s"$cust interval not contiguous")
          assert(a._3 != b._3, s"$cust adjacent runs share a status")
        case _ =>
      }
      assert(sorted.last._5.isEmpty, s"$cust last interval must be open")
    }
  }

  test("q189 profile equals brute-force column statistics") {
    val got = q("q189_column_profile").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getString(5), r.getLong(6)))).toMap
    def check[T: Ordering](name: String, vals: Seq[T]): Unit = {
      val (nulls, distinct, mn, mx, top, freq) = got(name)
      assert(nulls == 0L)
      assert(distinct == vals.distinct.length.toLong)
      assert(mn == vals.min.toString && mx == vals.max.toString)
      val counts = vals.map(_.toString).groupBy(x => x).view
        .mapValues(_.length).toMap
      val best = counts.toSeq.sortBy { case (v, f) => (-f, v) }.head
      assert((top, freq) == ((best._1, best._2.toLong)))
    }
    check("o_orderkey", orders.map(_._1).toSeq)
    check("o_custkey", orders.map(_._2).toSeq)
    check("o_orderstatus", orders.map(_._3).toSeq)
  }
}
