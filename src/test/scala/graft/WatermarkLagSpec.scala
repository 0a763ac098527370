package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventWindows

/** Pins the micro-batch watermark propagation rule the late-data
  * oracles (StreamLate / q_*_stream_late) encode, measured on this
  * Spark build: the watermark in effect while batch b is processed is
  * derived from the event-time stats of batches ≤ b−2 (the offsets and
  * metadata of batch b are planned before batch b−1's stats commit),
  * so batches 0 AND 1 both run under the initial watermark. The
  * trailing no-data batches of an AvailableNow run then advance the
  * watermark to the global max − delay, finalizing append-mode
  * windows. If a Spark upgrade shifts this propagation by a batch,
  * THIS spec fails first and points at the rule to re-derive.
  */
class WatermarkLagSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def run(name: String, tss: Seq[String]): Seq[String] = {
    val landing = Files.createTempDirectory(s"graft-$name-landing").toString
    val outDir = Files.createTempDirectory(s"graft-$name-out").toString
    val ckpt = Files.createTempDirectory(s"graft-$name-ckpt").toString
    tss.zipWithIndex.foreach { case (ts, i) =>
      val f = new java.io.File(landing, s"b_$i.json")
      Files.writeString(f.toPath,
        s"""{"event_id":$i,"ts":"$ts","event_type":"t","value":1.0}""")
      assert(f.setLastModified(1700000000000L + i * 60000L))
    }
    val q = EventWindows.start(spark, landing, outDir, ckpt)
    assert(q.awaitTermination(120000L))
    spark.read
      .schema("window_start STRING, event_type STRING, n_events LONG")
      .json(outDir)
      .collect().map(_.getString(0)).sorted.toSeq
  }

  // EventWindows: 1 h tumbling windows, 2 h watermark delay.

  test("batch 1 runs under the initial watermark (its metadata predates batch 0's stats)") {
    // batch 0: 10:00 -> wm candidate 08:00
    // batch 1: 04:00 -> 6 h behind batch 0; kept, because batch 1's
    //                   watermark predates batch 0's stats
    // batch 2: 05:30 -> dropped: batch 0's stats (wm 08:00) now apply
    // batch 3: 23:00 -> final wm 21:00 finalizes all kept windows;
    //                   its own window stays open
    assert(run("wmlag1", Seq(
      "2024-03-01T10:00:00.000000Z", "2024-03-01T04:00:00.000000Z",
      "2024-03-01T05:30:00.000000Z", "2024-03-01T23:00:00.000000Z"))
      === Seq("2024-03-01 04:00:00", "2024-03-01 10:00:00"))
  }

  test("batch b filters against stats of batches <= b-2, not b-1") {
    // Decisive max sits in batch 1: if batch 2's watermark folded in
    // batch 1's 10:00 (wm 08:00) the 05:30 row would drop; observed
    // behavior keeps it — batch 2 sees only batch 0's 01:00.
    assert(run("wmlag2", Seq(
      "2024-03-01T01:00:00.000000Z", "2024-03-01T10:00:00.000000Z",
      "2024-03-01T05:30:00.000000Z", "2024-03-01T23:00:00.000000Z"))
      === Seq("2024-03-01 01:00:00", "2024-03-01 05:00:00",
        "2024-03-01 10:00:00"))
  }
}
