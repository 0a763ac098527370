package graft

import java.nio.file.Files
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessions

/** Streaming session windows == the batch gap-islands derivation
  * restricted to finalized sessions (session end = last event + gap,
  * finalized once the watermark passes it). Pins the island derivation
  * and append-mode finalization; the exact-gap boundary rule (touching
  * ranges MERGE on both forms) is pinned by SessionBoundarySpec.
  */
class SessionsSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("streamed session windows == batch sessions over finalized range") {
    val landing = Files.createTempDirectory("graft-ss-landing").toString
    val outDir = Files.createTempDirectory("graft-ss-out").toString
    val ckpt = Files.createTempDirectory("graft-ss-ckpt").toString

    val events = Tables.load(spark, SparkT.Sf0001, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val rows = events.orderBy("event_id").collect()
    val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      .withZone(ZoneOffset.UTC)
    rows.grouped(math.max(1, rows.length / 3 + 1)).zipWithIndex.foreach {
      case (chunk, i) =>
        val lines = chunk.map { r =>
          val ts = fmt.format(r.getTimestamp(1).toInstant)
          s"""{"event_id":${r.getLong(0)},"ts":"$ts","event_type":"${r.getString(2)}","value":${r.getDouble(3)}}"""
        }
        val f = new java.io.File(landing, s"events_$i.json")
        Files.writeString(f.toPath, lines.mkString("\n"))
        assert(f.setLastModified(1700000000000L + i * 60000L))
    }

    val q = Sessions.start(spark, landing, outDir, ckpt)
    q.awaitTermination(180000L)

    val streamed = spark.read
      .schema("session_start STRING, event_type STRING, n_events LONG")
      .json(outDir)
      .select("event_type", "session_start", "n_events").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    // batch twin: sessions whose end (last event + gap) the final
    // watermark passed. JSON landing carries millisecond timestamps, so
    // the twin runs on ms-truncated ts like the stream saw.
    val msEvents = events.withColumn("ts",
      timestamp_millis((unix_micros(col("ts")) / 1000L).cast("long")))
    val maxUs = msEvents.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val watermarkUs = maxUs - 2L * 3600L * 1000000L
    val batch = Sessions.batchSessions(msEvents)
      .withColumn("start_us",
        unix_micros(to_timestamp(col("session_start"), "yyyy-MM-dd HH:mm:ss")))
      .filter(col("start_us") + col("duration_secs") * 1000000L +
        lit(Sessions.GapMicros) <= watermarkUs)
      .select("event_type", "session_start", "n_events").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
