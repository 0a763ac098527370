package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamFunnel

/** Streaming funnel (CEP state machine): cross-batch carry — the state
  * written by batch 1 must advance, not reset, in batch 2 — and the
  * final per-user state must equal the batch fold over the whole feed.
  * (The one-batch driver row q_funnel_stream pins the hash; this spec
  * pins the STATEFULNESS a single batch cannot exercise.)
  */
class StreamFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("online deviation: a late view cannot retro-qualify a batch-1 click") {
    val landing = Files.createTempDirectory("graft-funnel-late").toString
    val outDir = Files.createTempDirectory("graft-funnel-late-out").toString
    val ckpt = Files.createTempDirectory("graft-funnel-late-ckpt").toString
    // batch 1: the click (no view yet) — machine rejects it.
    // batch 2: a view with an EARLIER event time — offline, the click
    // would qualify; online it must not (the documented CEP contract).
    val b1 = """{"user_id":9,"event_id":2,"event_type":"click","ts":"2024-01-01T00:10:00Z"}"""
    val b2 = """{"user_id":9,"event_id":1,"event_type":"view","ts":"2024-01-01T00:05:00Z"}"""
    for ((content, i) <- Seq(b1, b2).zipWithIndex) {
      val f = new java.io.File(landing, s"late_$i.json")
      Files.writeString(f.toPath, content)
      assert(f.setLastModified(1700000000000L + i * 60000L))
    }
    val q = StreamFunnel.start(spark, landing, outDir, ckpt)
    assert(q.awaitTermination(120000L), "late-view stream did not drain")
    val rows = spark.read
      .schema("user_id LONG, stage LONG, view_us LONG, click_us LONG, " +
        "purchase_us LONG, n_seen LONG")
      .json(outDir).collect()
    val fin = rows.maxBy(_.getAs[Long]("n_seen"))
    assert(fin.getAs[Long]("n_seen") === 2L)
    assert(fin.getAs[Long]("stage") === 1L,
      "online funnel must not retro-qualify the batch-1 click")
    assert(fin.getAs[Any]("click_us") == null)
  }

  test("two in-order landings: state carries across batches to the batch-fold result") {
    val landing = Files.createTempDirectory("graft-funnel-landing").toString
    val outDir = Files.createTempDirectory("graft-funnel-out").toString
    val ckpt = Files.createTempDirectory("graft-funnel-ckpt").toString

    // land the events table as TWO event-time-ordered NDJSON files;
    // mtimes force the file-source ordering
    val evs = Tables.load(spark, SparkT.Sf0001, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .orderBy("us", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val chunks = evs.grouped(evs.length / 2 + 1).toSeq
    assert(chunks.length === 2)
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val lines = chunk.map { case (u, e, t, us) =>
        val iso = java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS)
        s"""{"user_id":$u,"event_id":$e,"event_type":"$t","ts":"$iso"}"""
      }.mkString("\n")
      val f = new java.io.File(landing, s"batch_$i.json")
      Files.writeString(f.toPath, lines)
      assert(f.setLastModified(1700000000000L + i * 60000L))
    }

    val q = StreamFunnel.start(spark, landing, outDir, ckpt)
    assert(q.awaitTermination(120000L), "funnel stream did not drain")

    val rows = spark.read
      .schema("user_id LONG, stage LONG, view_us LONG, click_us LONG, " +
        "purchase_us LONG, n_seen LONG")
      .json(outDir).collect()
    // Final state per user = max-n_seen row (the progress-log contract).
    val finals = rows.groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) => u -> rs.maxBy(_.getAs[Long]("n_seen")) }

    // Batch fold over the WHOLE feed, per user.
    evs.groupBy(_._1).foreach { case (uid, es) =>
      var v, c, p = Option.empty[Long]
      es.sortBy(e => (e._4, e._2)).foreach {
        case (_, _, "view", us) => if (v.isEmpty) v = Some(us)
        case (_, _, "click", us) => if (v.isDefined && c.isEmpty) c = Some(us)
        case (_, _, "purchase", us) => if (c.isDefined && p.isEmpty) p = Some(us)
        case _ =>
      }
      val r = finals(uid)
      assert(r.getAs[Long]("n_seen") === es.length.toLong, s"user $uid fold count")
      assert(Option(r.getAs[Any]("view_us")) === v, s"user $uid view")
      assert(Option(r.getAs[Any]("click_us")) === c, s"user $uid click")
      assert(Option(r.getAs[Any]("purchase_us")) === p, s"user $uid purchase")
    }
    // The carry itself: users active in both batches emitted one
    // progress row per batch with strictly increasing n_seen.
    val carried = rows.groupBy(_.getAs[Long]("user_id"))
      .filter(_._2.length == 2)
    assert(carried.nonEmpty, "no user spanned both batches")
    carried.values.foreach { rs =>
      val ns = rs.map(_.getAs[Long]("n_seen")).sorted
      assert(ns(0) < ns(1), "second batch must extend, not reset, the fold")
    }
  }
}
