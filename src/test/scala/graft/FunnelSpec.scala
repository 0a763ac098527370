package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fleet

/** Ordered-funnel attribution (q_event_funnel): ordering invariants, a
  * per-user Scala recompute of the three-stage pattern match, and the
  * single-shuffle plan contract that makes the shape scale.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("funnel stages are ordered, consistent, and match a Scala recompute") {
    val rows = Fleet.eventFunnel(spark, SparkT.Sf0001).collect()
    assert(rows.nonEmpty)
    // Recompute the pattern match per user from the raw events (via
    // Tables.load — the nanos column needs the same micros conversion).
    val events = Tables.load(spark, SparkT.Sf0001, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("us")))
      .groupBy(_._1)
    rows.foreach { r =>
      val seq = events(r.getAs[Long]("user_id")).sortBy(e => (e._4, e._2))
      // The funnel fold: first view, first click after it, first
      // purchase after that — exactly the running-window semantics.
      var v, c, p = Option.empty[Long]
      seq.foreach {
        case (_, _, "view", us) => if (v.isEmpty) v = Some(us)
        case (_, _, "click", us) => if (v.isDefined && c.isEmpty) c = Some(us)
        case (_, _, "purchase", us) => if (c.isDefined && p.isEmpty) p = Some(us)
        case _ =>
      }
      val stage = r.getAs[Long]("stage")
      assert(stage === (if (p.isDefined) 3L else if (c.isDefined) 2L
                        else if (v.isDefined) 1L else 0L))
      // Ordering invariant via the second deltas: every present step
      // delta is non-negative.
      Option(r.getAs[Long]("view_to_click_secs"))
        .foreach(d => assert(d >= 0L))
      Option(r.getAs[Long]("click_to_purchase_secs"))
        .foreach(d => assert(d >= 0L))
      // Null pattern matches the stage.
      assert((r.getAs[String]("purchase_time") != null) === (stage == 3L))
      assert((r.getAs[String]("click_time") != null) === (stage >= 2L))
      assert((r.getAs[String]("view_time") != null) === (stage >= 1L))
    }
  }

  test("funnel rejection branches: out-of-order steps never qualify") {
    import spark.implicits._
    def ts(s: Int) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val events = Seq(
      // user 1: click BEFORE any view — the click must not qualify;
      // the later view->purchase pair lacks a qualified click: stage 1
      (1L, 1L, ts(1), "click"), (1L, 2L, ts(2), "view"),
      (1L, 3L, ts(3), "purchase"),
      // user 2: purchase between view and click — purchase precedes
      // the qualified click, so it must not count: stage 2
      (2L, 4L, ts(1), "view"), (2L, 5L, ts(2), "purchase"),
      (2L, 6L, ts(3), "click"),
      // user 3: the happy path, interleaved with noise: stage 3
      (3L, 7L, ts(1), "error"), (3L, 8L, ts(2), "view"),
      (3L, 9L, ts(3), "click"), (3L, 10L, ts(4), "purchase"),
      // user 4: no view at all: stage 0
      (4L, 11L, ts(1), "click"), (4L, 12L, ts(2), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val rows = Fleet.eventFunnelFrom(events).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("stage")).toMap
    assert(rows === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 0L))
  }

  test("funnel plan: one user_id shuffle feeds windows and the final aggregate") {
    spark.conf.set("graft.sort.results", "false")
    try {
      val df = Fleet.eventFunnel(spark, SparkT.Sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val finalSection = plan.split("== Initial Plan ==").head
      val exchanges = "Exchange".r.findAllIn(finalSection).length
      assert(exchanges == 1,
        s"funnel must reuse one user_id partitioning, got $exchanges:\n$plan")
      assert(!finalSection.contains("Join"),
        s"funnel must not self-join:\n$plan")
    } finally spark.conf.set("graft.sort.results", "true")
  }
}
