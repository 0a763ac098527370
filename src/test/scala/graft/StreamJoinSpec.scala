package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoin

/** Stream-stream interval join == the identical batch join over the
  * same landed input: every (observation, action) pair on one product
  * within the response window appears exactly once, pairs outside the
  * window or across products never appear.
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private val T0 = Instant.parse("2025-08-01T10:00:00Z")
  private def ts(mins: Long) = T0.plusSeconds(mins * 60).toString.replace("Z", ".000Z")

  test("streamed interval join == batch twin; window and product bounds hold") {
    val obsDir = Files.createTempDirectory("graft-sj-obs").toString
    val actDir = Files.createTempDirectory("graft-sj-act").toString
    val outDir = Files.createTempDirectory("graft-sj-out").toString
    val ckpt = Files.createTempDirectory("graft-sj-ckpt").toString

    // obs 1@t0/p1 pairs with actions at +5 and +10; obs 2@t0/p2 has a
    // same-time action on p2 only; obs 3@t30/p1 pairs with nothing
    // (nearest action 11 min later on the wrong side of the window end);
    // obs 4's action is 1 min BEFORE it — never joined.
    val obsLines = Seq(
      s"""{"obs_id":1,"ts":"${ts(0)}","product_id":1,"seller":"A","price":100}""",
      s"""{"obs_id":2,"ts":"${ts(0)}","product_id":2,"seller":"B","price":200}""",
      s"""{"obs_id":3,"ts":"${ts(30)}","product_id":1,"seller":"A","price":90}""",
      s"""{"obs_id":4,"ts":"${ts(60)}","product_id":2,"seller":"B","price":180}""")
    val actLines = Seq(
      s"""{"action_id":11,"ts":"${ts(5)}","product_id":1,"new_price":99}""",
      s"""{"action_id":12,"ts":"${ts(10)}","product_id":1,"new_price":98}""",
      s"""{"action_id":13,"ts":"${ts(0)}","product_id":2,"new_price":199}""",
      s"""{"action_id":14,"ts":"${ts(41)}","product_id":1,"new_price":89}""",
      s"""{"action_id":15,"ts":"${ts(59)}","product_id":2,"new_price":179}""")
    Seq((obsDir, obsLines), (actDir, actLines)).foreach { case (dir, lines) =>
      lines.zipWithIndex.foreach { case (l, i) =>
        val f = new java.io.File(dir, s"f_$i.json")
        Files.writeString(f.toPath, l)
        assert(f.setLastModified(1700000000000L + i * 60000L))
      }
    }

    val q = StreamJoin.start(spark, obsDir, actDir, outDir, ckpt)
    q.awaitTermination(120000L)

    def keyed(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select("obs_id", "action_id", "response_secs").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val streamed = keyed(spark.read
      .schema("obs_id LONG, action_id LONG, product_id LONG, seller STRING, " +
        "price LONG, new_price LONG, response_secs LONG")
      .json(outDir))

    val batch = keyed(StreamJoin.joined(
      spark.read.schema(StreamJoin.obsSchema).json(obsDir),
      spark.read.schema(StreamJoin.actionSchema).json(actDir)))

    assert(streamed == batch)
    assert(streamed == Set((1L, 11L, 300L), (1L, 12L, 600L), (2L, 13L, 0L)))

    // the NARROW dial over the same landings: only pairs within
    // 2 minutes survive — action 12 (+10 min) drops, action 11
    // (+5 min) drops too; the same-time pair stays. Streamed == batch
    // at the second setting as well.
    val outN = Files.createTempDirectory("graft-sj-outn").toString
    val ckptN = Files.createTempDirectory("graft-sj-ckptn").toString
    val qn = StreamJoin.start(spark, obsDir, actDir, outN, ckptN,
      StreamJoin.ResponseWindowNarrow)
    qn.awaitTermination(120000L)
    val streamedN = keyed(spark.read
      .schema("obs_id LONG, action_id LONG, product_id LONG, seller STRING, " +
        "price LONG, new_price LONG, response_secs LONG")
      .json(outN))
    val batchN = keyed(StreamJoin.joined(
      spark.read.schema(StreamJoin.obsSchema).json(obsDir),
      spark.read.schema(StreamJoin.actionSchema).json(actDir),
      StreamJoin.ResponseWindowNarrow))
    assert(streamedN == batchN)
    assert(streamedN == Set((2L, 13L, 0L)))
  }
}
