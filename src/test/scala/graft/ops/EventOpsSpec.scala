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
}
