package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

import graft.operators.Relational

/** Laws for cohort retention and the Markov transition matrix on a
  * planted multi-cohort event stream (the shipped testdata is
  * single-cohort — every user is active in week one — so the
  * interesting structure must be planted).
  */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def ts(day: Int, h: Int = 12): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  /** Two cohorts: users 1-2 first seen Mon Jan 1 week, user 3 first
    * seen Mon Jan 8 week. User 1 returns in week 2; user 2 does not. */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cohort").toString
    val rows = Seq(
      (1L, ts(1), 1L, "view", 1.0, "{}"),
      (2L, ts(2), 2L, "view", 1.0, "{}"),
      (3L, ts(9), 1L, "click", 1.0, "{}"),     // user 1 retained in w1
      (4L, ts(8), 3L, "view", 1.0, "{}"),      // cohort 2 begins
      (5L, ts(10), 3L, "purchase", 1.0, "{}"),
      (6L, ts(3), 1L, "click", 1.0, "{}"),
      (7L, ts(3, 13), 1L, "purchase", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("cohort retention: triangle shape, index-0 full, monotone user counts") {
    val rows = Relational.cohortRetention(spark, plantedDir).collect()
      .map(r => (r.getAs[String]("cohort_week"), r.getAs[Long]("week_index")) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("retention"))).toMap
    // cohort of Jan-1 week: 2 users at index 0, only user 1 at index 1
    assert(rows(("2024-01-01", 0L)) === ((2L, 2L, 1.0)))
    assert(rows(("2024-01-01", 1L)) === ((1L, 2L, 0.5)))
    // cohort of Jan-8 week: one user, index 0 only
    assert(rows(("2024-01-08", 0L)) === ((1L, 1L, 1.0)))
    assert(rows.size === 3)
    // index 0 is always retention 1.0 by construction
    rows.collect { case ((_, 0L), (_, _, ret)) => assert(ret === 1.0) }
  }

  test("transitions: per-user ordered pairing, rows sum to 1") {
    val rows = Relational.eventTransitions(spark, plantedDir).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    // user 1: view→click→purchase→click; user 3: view→purchase
    assert(rows(("view", "click"))._1 === 1L)
    assert(rows(("view", "purchase"))._1 === 1L)
    assert(rows(("click", "purchase"))._1 === 1L)
    assert(rows(("purchase", "click"))._1 === 1L)
    assert(rows.size === 4)
    // conditional probabilities: each from_type row sums to 1
    rows.keys.map(_._1).toSet.foreach { (ft: String) =>
      val s = rows.collect { case ((f, _), (_, p)) if f == ft => p }.sum
      assert(math.abs(s - 1.0) < 1e-9, s"row $ft sums to $s")
    }
    // user 2 has a single event — contributes no transition
  }

  test("multi-touch: linear credit conserves attributed purchase value") {
    val touched = Relational.rangeJoinBinned(spark, SparkT.Sf0001).collect()
      .filter(_.getAs[Long]("n_prior_clicks") > 0L)
    assert(touched.nonEmpty, "fixture has no attributed purchases")
    val attributedValue = touched.map(_.getAs[Double]("purchase_value")).sum
    val credits = Relational.multiTouchAttribution(spark, SparkT.Sf0001).collect()
    val linTotal = credits.map(_.getAs[Double]("credit_linear")).sum
    val decTotal = credits.map(_.getAs[Double]("credit_decay")).sum
    // each purchase's value splits exactly across its clicks, up to the
    // 1e-4 per-share rounding (n_shares × 1e-4 bound)
    val tol = 1e-4 * (credits.map(_.getAs[Long]("n_purchases")).sum + 1)
    assert(math.abs(linTotal - attributedValue) <= tol,
      s"linear credit $linTotal != attributed $attributedValue")
    assert(math.abs(decTotal - attributedValue) <= tol,
      s"decay credit $decTotal != attributed $attributedValue")
  }

  test("transitions on real data: full matrix rows normalize") {
    val rows = Relational.eventTransitions(spark, SparkT.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (ft, rs) =>
      val s = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"row $ft sums to $s")
    }
  }

  test("dq audit: planted corruption is counted, clean checks pass") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dq").toString
    // orders: duplicate key 1, a null custkey, a zero price, a bad status
    Seq(
      (Some(1L), Some(10L), "O", 100.0),
      (Some(1L), Some(11L), "F", 200.0),   // dup orderkey
      (Some(2L), None: Option[Long], "P", 300.0), // null custkey
      (Some(3L), Some(12L), "X", 0.0))     // bad status + non-positive price
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    // lineitem: one orphan (orderkey 99)
    Seq((1L, 1L), (2L, 2L), (99L, 3L))
      .toDF("l_orderkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val r = Relational.dqAudit(spark, tmp).collect()
      .map(x => x.getAs[String]("constraint") ->
        (x.getAs[Long]("n_violations"), x.getAs[Boolean]("passed"))).toMap
    assert(r("orders.o_orderkey unique") === ((1L, false)))
    assert(r("orders.o_custkey not null") === ((1L, false)))
    assert(r("orders.o_totalprice positive") === ((1L, false)))
    assert(r("orders.o_orderstatus in (O,F,P)") === ((1L, false)))
    assert(r("lineitem.l_orderkey references orders") === ((1L, false)))
    // and the shipped testdata is clean end to end
    val clean = Relational.dqAudit(spark, SparkT.Sf0001).collect()
    clean.foreach(x => assert(x.getAs[Boolean]("passed"),
      s"testdata violates ${x.getAs[String]("constraint")}"))
  }

  test("cdc compaction: last op wins, trailing delete removes the key") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cdc").toString
    Seq(
      (1L, ts(1), 1L, "signup", 10.0, "{}"),   // user 1: I,U,U → last U
      (2L, ts(2), 1L, "click", 20.0, "{}"),
      (3L, ts(3), 1L, "click", 30.0, "{}"),
      (4L, ts(1), 2L, "signup", 1.0, "{}"),    // user 2: I,D → absent
      (5L, ts(2), 2L, "error", 0.0, "{}"),
      (6L, ts(1), 3L, "signup", 7.0, "{}"),    // user 3: I only
      (7L, ts(1), 4L, "error", 0.0, "{}"),     // user 4: D only → absent
      (8L, ts(2), 5L, "view", 99.0, "{}"))     // non-op event type ignored
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Relational.cdcCompact(spark, tmp).collect()
      .map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Double]("current_value"), x.getAs[String]("last_op"),
          x.getAs[Long]("n_ops"))).toMap
    assert(r === Map(
      1L -> ((30.0, "U", 3L)),
      3L -> ((7.0, "I", 1L))))
  }

  test("benford: shares are distributions, all nine digits emitted") {
    val rows = Relational.benfordDigits(spark, SparkT.Sf0001).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSet === (1 to 9).toSet)
    val obs = rows.map(_.getAs[Double]("obs_share")).sum
    assert(math.abs(obs - 1.0) < 1e-4)
    val exp = rows.map(_.getAs[Double]("exp_share")).sum
    assert(math.abs(exp - 1.0) < 1e-4)
  }
}
