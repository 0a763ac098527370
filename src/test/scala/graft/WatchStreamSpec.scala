package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.streaming.WatchStream

/** Streaming slice (T1–T4): the VERDICT's batch-equivalence bar — the
  * stateful stream over replayed micro-batches must hash-equal the batch
  * window query over the same events.
  */
class WatchStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def batchExpected(): Map[Long, (Long, Long, Boolean)] =
    Relational.runningUndercut(spark, SparkT.Sf0001).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("undercut"), r.getAs[Long]("sliding_hits"),
          r.getAs[Boolean]("is_bot")))).toMap

  test("batch detectBots == runningUndercut window query") {
    import spark.implicits._
    val events = Tables.load(spark, SparkT.Sf0001, "events")
      .select(col("event_id"), col("user_id"), col("value"))
      .as[WatchStream.WatchEvent]
    val got = WatchStream.detectBots(events).collect()
      .map(o => o.event_id -> ((o.undercut, o.sliding_hits, o.is_bot))).toMap
    assert(got === batchExpected())
  }

  test("streamed micro-batches reproduce the batch result exactly (T1-T4)") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-landing").toString
    val outDir = Files.createTempDirectory("graft-watch-out").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    // replay the events table as 3 capture files in event_id order
    // (T2's nested shape: one JSON record per capture with an
    // observations array); mtimes force the file-source ordering
    val evs = Tables.load(spark, SparkT.Sf0001, "events")
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val chunks = evs.grouped(math.max(1, evs.length / 3 + 1)).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val obs = chunk.map { case (e, u, v) =>
        s"""{"event_id":$e,"user_id":$u,"value":$v}"""
      }.mkString("[", ",", "]")
      val f = new java.io.File(landing, s"capture_$i.json")
      Files.writeString(f.toPath, s"""{"capture_id":$i,"observations":$obs}""")
      assert(f.setLastModified(1700000000000L + i * 60000L))
    }

    val q = WatchStream.start(spark, landing, outDir, ckpt)
    q.awaitTermination(120000L)

    val got = spark.read
      .schema("event_id LONG, undercut LONG, sliding_hits LONG, is_bot BOOLEAN, user_id LONG")
      .json(outDir)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("undercut"), r.getAs[Long]("sliding_hits"),
          r.getAs[Boolean]("is_bot")))).toMap
    val expected = batchExpected()
    assert(got.size === expected.size)
    assert(got === expected)
  }
}
