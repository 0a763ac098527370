package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessions

/** The exact-gap boundary law of sessionization. Spark's
  * `session_window` represents each event as the half-open range
  * [ts, ts + gap) and merges ranges that overlap OR TOUCH — so two
  * events exactly `gap` apart land in ONE session. The batch twin and
  * every oracle must state the same rule (`diff > gap` starts a new
  * session), or a corpus containing an exact-gap adjacency diverges —
  * found by the sf0.001 full-catalog sweep, where purchase events at
  * 01:36:00 and 02:06:00 (gap = 30 min exactly) split in the oracle
  * but merged in the stream.
  */
class SessionBoundarySpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def sessionsOf(minutes: Seq[Int]): Seq[(String, Long)] = {
    import spark.implicits._
    val df = minutes.zipWithIndex
      .map { case (m, i) =>
        (i.toLong, java.sql.Timestamp.valueOf(f"2024-03-01 00:$m%02d:00"), "t")
      }
      .toDF("event_id", "ts", "event_type")
    df.groupBy(session_window(col("ts"), Sessions.Gap), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("session_window.start"), "HH:mm").as("s"),
        col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
  }

  test("session_window merges events EXACTLY gap apart (touching ranges)") {
    // 00:00 and 00:30 with gap 30 min: one session of 2
    assert(sessionsOf(Seq(0, 30)) === Seq(("00:00", 2L)))
    // one microsecond past the gap splits — proven at minute grain:
    // 00:00 and 00:31 split
    assert(sessionsOf(Seq(0, 31)) === Seq(("00:00", 1L), ("00:31", 1L)))
  }

  test("the batch twin states the same boundary rule") {
    import spark.implicits._
    val df = Seq(
      (0L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), "t"),
      (1L, java.sql.Timestamp.valueOf("2024-03-01 00:30:00"), "t"))
      .toDF("event_id", "ts", "event_type")
    val r = Sessions.batchSessions(df)
      .select("session_start", "n_events")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(r === Seq(("2024-03-01 00:00:00", 2L)))
  }
}
