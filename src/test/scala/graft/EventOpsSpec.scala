package graft

import graft.operators.EventOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class EventOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mkEvents(rows: Seq[(Long, Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (id, u, et, t) => (id, u, et, ts(t)) }
      .toDF("event_id", "user_id", "event_type", "ts")
  }

  test("funnel: strict ordering — later-stage events before conversion don't count") {
    val ev = mkEvents(Seq(
      // u1 completes view -> click -> purchase in order
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "click", "2024-01-01 10:05:00"),
      (3L, 1L, "purchase", "2024-01-01 10:30:00"),
      // u2 clicks BEFORE first view: click must not count
      (4L, 2L, "click", "2024-01-01 09:00:00"),
      (5L, 2L, "view", "2024-01-01 11:00:00"),
      // u3 views only
      (6L, 3L, "view", "2024-01-01 08:00:00")
    ))
    val got = EventOps.funnel(ev, Seq("view", "click", "purchase"))
      .orderBy("stage").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(3L, 1L, 1L)) // n_users by stage
    assert(got(1).getLong(3) == 300000000L)  // u1 view->click 5 min
    assert(got(2).getLong(3) == 1500000000L) // u1 click->purchase 25 min
  }

  test("retention: cohort is the user's first epoch-bucket; offsets count from it") {
    val ev = mkEvents(Seq(
      (1L, 1L, "view", "2024-01-01 00:00:00"), // bucket A
      (2L, 1L, "view", "2024-01-09 00:00:00"), // A+1
      (3L, 1L, "view", "2024-01-09 01:00:00"), // A+1 again (2 events, 1 user)
      (4L, 2L, "view", "2024-01-09 12:00:00")  // cohort A+1 offset 0
    ))
    val got = EventOps.retention(ev, 604800L)
      .orderBy("cohort_start", "offset").collect()
    assert(got.length == 3)
    assert(got(0).getLong(1) == 0L && got(0).getLong(2) == 1L) // u1 week 0
    assert(got(1).getLong(1) == 1L && got(1).getLong(3) == 2L) // u1 week 1: 2 events
    assert(got(2).getLong(1) == 0L && got(2).getLong(2) == 1L) // u2 own cohort
  }

  test("sessionize: 30-min gap splits islands; durations sum within sessions") {
    val ev = mkEvents(Seq(
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "view", "2024-01-01 10:20:00"), // same session (gap 20m)
      (3L, 1L, "view", "2024-01-01 11:30:00"), // new session (gap 70m)
      (4L, 2L, "view", "2024-01-01 10:00:00")  // singleton session
    ))
    val got = EventOps.sessionize(ev, 1800L).orderBy("user_id").collect()
    assert(got(0).getLong(1) == 2L)             // u1: 2 sessions
    assert(got(0).getLong(3) == 2L)             // longest has 2 events
    assert(got(0).getLong(4) == 1200000000L)    // 20 min in session 1, 0 in session 2
    assert(got(1).getLong(1) == 1L && got(1).getLong(4) == 0L)
  }

  test("property: sessionize matches a brute-force fold on random streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val gap = 600L // 10 min
    val rows = (1 to 800).map { i =>
      val u = rnd.nextInt(12).toLong
      val t = 1700000000000000L + rnd.nextInt(100000) * 1000000L
      (i.toLong, u, "view", new Timestamp(t / 1000))
    }
    val got = EventOps.sessionize(
        rows.toDF("event_id", "user_id", "event_type", "ts"), gap)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // brute force: sort per user by (ts, id), fold sessions
    rows.groupBy(_._2).foreach { case (u, evs) =>
      val sorted = evs.map(e => (e._4.getTime * 1000L, e._1)).sorted
      var sessions = List.empty[List[Long]]
      sorted.foreach { case (t, _) =>
        sessions match {
          case cur :: rest if t - cur.head <= gap * 1000000L =>
            sessions = (t :: cur) :: rest
          case _ => sessions = List(t) :: sessions
        }
      }
      val nSess = sessions.length.toLong
      val nEv = sorted.length.toLong
      val maxEv = sessions.map(_.length).max.toLong
      val sumDur = sessions.map(s => s.max - s.min).sum
      assert(got(u) == ((nSess, nEv, maxEv, sumDur)), s"user $u")
    }
  }

  test("property: funnel matches a brute-force stage chain on random streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    val types = Seq("view", "click", "purchase", "other")
    val rows = (1 to 600).map { i =>
      val u = rnd.nextInt(10).toLong
      val t = 1700000000000000L + rnd.nextInt(100000) * 1000000L
      (i.toLong, u, types(rnd.nextInt(types.length)), new Timestamp(t / 1000))
    }
    val stages = Seq("view", "click", "purchase")
    val got = EventOps.funnel(
        rows.toDF("event_id", "user_id", "event_type", "ts"), stages)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // brute force: sequential strictly-after mins per user
    val perUser = rows.groupBy(_._2).view.mapValues { evs =>
      var prev = Long.MinValue
      var dead = false
      stages.map { st =>
        if (dead) None
        else {
          val cand = evs.filter(_._3 == st).map(_._4.getTime * 1000L)
            .filter(t => prev == Long.MinValue || t > prev)
          if (cand.isEmpty) { dead = true; None }
          else {
            val m = cand.min
            val step = if (prev == Long.MinValue) 0L else m - prev
            prev = m
            Some(step)
          }
        }
      }
    }.toMap
    stages.zipWithIndex.foreach { case (_, i) =>
      val reached = perUser.values.map(_(i)).collect { case Some(s) => s }
      assert(got((i + 1).toLong)._1 == reached.size.toLong, s"stage ${i + 1} users")
      assert(got((i + 1).toLong)._2 == reached.sum, s"stage ${i + 1} step sum")
    }
  }

  test("sessionize: exact-gap boundary stays in the same session (strict >)") {
    val ev = mkEvents(Seq(
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "view", "2024-01-01 10:30:00") // exactly 1800s later
    ))
    val got = EventOps.sessionize(ev, 1800L).collect()
    assert(got(0).getLong(1) == 1L)
  }
}
