package graft

import java.nio.file.Files
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventWindows

/** Watermarked event-time windows: the streamed append output must
  * equal the batch aggregation restricted to windows finalized by the
  * final watermark — and the not-yet-final tail must be withheld.
  */
class EventWindowsSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("streamed watermarked windows == batch agg over finalized windows") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-ew-landing").toString
    val outDir = Files.createTempDirectory("graft-ew-out").toString
    val ckpt = Files.createTempDirectory("graft-ew-ckpt").toString

    val events = Tables.load(spark, SparkT.Sf0001, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val rows = events.orderBy("event_id").collect()
    val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      .withZone(ZoneOffset.UTC)
    val chunks = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val lines = chunk.map { r =>
        val ts = fmt.format(r.getTimestamp(1).toInstant)
        s"""{"event_id":${r.getLong(0)},"ts":"$ts","event_type":"${r.getString(2)}","value":${r.getDouble(3)}}"""
      }
      val f = new java.io.File(landing, s"events_$i.json")
      Files.writeString(f.toPath, lines.mkString("\n"))
      assert(f.setLastModified(1700000000000L + i * 60000L))
    }

    val q = EventWindows.start(spark, landing, outDir, ckpt)
    q.awaitTermination(120000L)

    val streamed = spark.read
      .schema("window_start STRING, event_type STRING, n_events LONG")
      .json(outDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0).getTime
    val batchAll = EventWindows.batch(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sdf = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    sdf.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    // a window [s, s+1h) finalizes when watermark (maxTs - 2h) passes its end
    val finalized = batchAll.filter { case ((ws, _), _) =>
      sdf.parse(ws).getTime + 3600_000L <= maxTs - 7200_000L
    }

    assert(streamed === finalized)
    assert(finalized.nonEmpty)
    assert(streamed.size < batchAll.size) // the tail was correctly withheld
  }
}
