package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force checks of the behavioral-analytics operators against a
  * sequential replay of each user's timeline — the oracle gate proves
  * cross-engine equality, these pin the SEMANTICS (who gets credit, what
  * the lookback excludes) against an independent spelling.
  */
class EventOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q172 last-touch equals a sequential replay of each user timeline") {
    val events = Tables.t(spark, TestSpark.Sf, "events")
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 +
          (r.getTimestamp(2).getNanos / 1000) % 1000,
        r.getString(3)))
    val lookback = 7L * 24 * 3600 * 1000000L
    val expected = events.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
      val timeline = evs.sortBy(e => (e._3, e._1)).toSeq
      var lastTouch: Option[(Long, Long, String)] = None // (us, id, type)
      timeline.flatMap { case (id, _, us, tp) =>
        val out = if (tp == "purchase") {
          val attributed = lastTouch.filter(t => us - t._1 <= lookback)
          Some(id -> attributed.map(t => (t._2, t._3, (us - t._1) / 1000000)))
        } else None
        if (tp == "view" || tp == "click") lastTouch = Some((us, id, tp))
        out
      }
    }.toMap
    val got = SparkEntry.queries("q172_last_touch")(spark, TestSpark.Sf)
      .collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(4)) None
          else Some((r.getLong(4), r.getString(5), r.getLong(6))))
      }.toMap
    assert(got.keySet == expected.keySet, "one row per purchase")
    assert(got == expected)
    // the credited touch strictly precedes its purchase, within lookback
    got.values.flatten.foreach { case (_, tp, gap) =>
      assert(gap >= 0 && gap <= 7L * 24 * 3600)
      assert(tp == "view" || tp == "click")
    }
  }

  private def dailyCounts: Map[(String, Long), Long] =
    Tables.t(spark, TestSpark.Sf, "events")
      .select("event_type", "ts").collect()
      .map { r =>
        val us = r.getTimestamp(1).getTime * 1000 +
          (r.getTimestamp(1).getNanos / 1000) % 1000
        // floorDiv: epoch-day of the event's UTC day
        (r.getString(0), Math.floorDiv(us, 86400000000L))
      }.groupBy(identity).view.mapValues(_.length.toLong).toMap

  test("q174 trend slope equals the closed-form least squares") {
    val daily = dailyCounts
    val expected = daily.keys.map(_._1).toSet.map { (tp: String) =>
      val pts = daily.collect { case ((t, x), n) if t == tp => (x, n) }.toSeq
      val np = pts.length.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      tp -> ((np, sy,
        (np * sxy - sx * sy).toDouble / (np * sxx - sx * sx).toDouble))
    }.toMap
    val got = SparkEntry.queries("q174_trend_slope")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (tp, (nd, tot, slope)) =>
      assert((nd, tot) == (expected(tp)._1, expected(tp)._2))
      assert(math.abs(slope - expected(tp)._3) < 1e-9, s"$tp slope")
    }
  }

  test("q175 CUSUM picks the max-|deviation| day (earliest on ties)") {
    val daily = dailyCounts
    val got = SparkEntry.queries("q175_cusum_changepoint")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    daily.keys.map(_._1).toSet.foreach { (tp: String) =>
      val pts = daily.collect { case ((t, x), n) if t == tp => (x, n) }
        .toSeq.sortBy(_._1)
      val total = pts.map(_._2).sum
      val mean = total.toDouble / pts.length
      var p = 0L
      val cusums = pts.zipWithIndex.map { case ((x, n), i) =>
        p += n; (x, p.toDouble - (i + 1) * mean)
      }
      val best = cusums.maxBy { case (x, c) => (math.abs(c), -x) }
      val (nd, cpDay, cAt) = got(tp)
      assert(nd == pts.length.toLong)
      assert(cpDay == best._1, s"$tp changepoint day")
      assert(math.abs(cAt - best._2) < 1e-9)
    }
  }

  test("q176 rolling actives equal per-window distinct user sets") {
    val evs = Tables.t(spark, TestSpark.Sf, "events")
      .select("user_id", "ts").collect()
      .map { r =>
        val us = r.getTimestamp(1).getTime * 1000 +
          (r.getTimestamp(1).getNanos / 1000) % 1000
        (r.getLong(0), Math.floorDiv(us, 86400000000L))
      }
    val days = evs.map(_._2).distinct.sorted
    val expected = days.map { w =>
      val wau = evs.collect {
        case (u, d) if d >= w - 6 && d <= w => u }.distinct.length.toLong
      val dau = evs.collect { case (u, d) if d == w => u }
        .distinct.length.toLong
      w -> ((dau, wau))
    }.toMap
    val got = SparkEntry.queries("q176_rolling_active")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == expected)
    got.foreach { case (_, (dau, wau)) => assert(dau <= wau) }
  }

  test("q184 lateness profile equals a sequential hashed replay") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val evs = Tables.t(spark, TestSpark.Sf, "events")
      .select("event_id", "ts").collect()
      .map { r =>
        val us = r.getTimestamp(1).getTime * 1000 +
          (r.getTimestamp(1).getNanos / 1000) % 1000
        (r.getLong(0), us, md5hex(r.getLong(0).toString))
      }.sortBy(e => (e._3, e._1))
    var hwm = -1L
    val lates = evs.map { case (_, us, _) =>
      val late = if (hwm > us) (hwm - us) / 1000000 else 0L
      hwm = math.max(hwm, us)
      late
    }
    val expected = lates.map { l =>
      if (l == 0) 0 else if (l <= 60) 1 else if (l <= 300) 2
      else if (l <= 900) 3 else 4
    }.groupBy(x => x).view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("q184_lateness_profile")(spark, TestSpark.Sf)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == expected)
    // shares sum to 1 over exact counts
    assert(got.values.sum == evs.length.toLong)
  }

  test("q178 z-test equals the hand-computed Welch statistic") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val users = Tables.t(spark, TestSpark.Sf, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).toSeq.map { case (u, es) =>
        (Integer.parseInt(md5hex(u.toString).take(4), 16) % 2,
          es.count(_._2 == "purchase").toLong)
      }
    def stats(arm: Int) = {
      val xs = users.collect { case (a, x) if a == arm => x }
      val n = xs.length.toLong
      val s = xs.sum; val q = xs.map(x => x * x).sum
      val mean = s.toDouble / n
      val variance = (q.toDouble - s.toDouble * s / n) / (n - 1)
      (n, mean, variance)
    }
    val (n0, m0, v0) = stats(0); val (n1, m1, v1) = stats(1)
    val z = (m1 - m0) / math.sqrt(v0 / n0 + v1 / n1)
    val r = SparkEntry.queries("q178_holdout_ztest")(spark, TestSpark.Sf)
      .collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((n0, n1)))
    assert(math.abs(r.getDouble(2) - m0) < 1e-12)
    assert(math.abs(r.getDouble(3) - m1) < 1e-12)
    assert(math.abs(r.getDouble(5) - z) < 1e-9)
    // an A/A split on the same population should not scream significance
    assert(math.abs(r.getDouble(5)) < 5.0, "md5 parity split badly skewed")
  }

  test("q179 stationary vector is a probability fixpoint of the chain") {
    val trans = Tables.t(spark, TestSpark.Sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).getTime * 1000 +
          (r.getTimestamp(1).getNanos / 1000) % 1000,
        r.getLong(2), r.getString(3)))
      .groupBy(_._1).toSeq.flatMap { case (_, es) =>
        es.sortBy(e => (e._2, e._3)).map(_._4).toSeq.sliding(2)
          .collect { case Seq(a, b) => (a, b) }
      }.groupBy(x => x).view.mapValues(_.size.toLong).toMap
    val byFrom = trans.groupBy(_._1._1).view
      .mapValues(m => m.values.sum).toMap
    val p = trans.map { case ((f, t), n) =>
      (f, t) -> n.toDouble / byFrom(f) }
    val states = byFrom.keys.toSeq.sorted
    val sinks = p.keys.map(_._2).toSeq.distinct.sorted
    var pi = states.map(s => s -> 1.0 / states.length).toMap
    (0 until 10).foreach { _ =>
      pi = sinks.map { to =>
        to -> p.collect { case ((f, t), pr) if t == to =>
          pr * pi.getOrElse(f, 0.0) }.sum
      }.toMap
    }
    val got = SparkEntry.queries("q179_markov_stationary")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == pi.keySet)
    got.foreach { case (s2, v) =>
      assert(math.abs(v - pi(s2)) < 1e-9, s"$s2: $v vs ${pi(s2)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9,
      "stationary mass must stay a probability vector")
  }
}
