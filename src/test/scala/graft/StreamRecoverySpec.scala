package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamCdc

/** Checkpoint recovery — the durability contract every long-running
  * streaming deployment actually relies on, exercised end-to-end on
  * the CDC compaction stream:
  *
  *   - INCREMENTAL RESUME: a second `Trigger.AvailableNow` run against
  *     the same checkpoint continues from the recorded offsets with
  *     the per-key state RESTORED (the op count carries across runs —
  *     a lost state store would reset it while leaving the final
  *     value correct, which is exactly the silent corruption this
  *     pins), processing only newly landed files.
  *   - CRASH MID-RUN: stopping the query between micro-batches and
  *     restarting neither drops nor duplicates emissions. The raw
  *     emission count is exact-once-countable because the sink's
  *     `_spark_metadata` transaction log admits each batch once —
  *     replayed batches overwrite, orphan files from an in-flight
  *     batch are never listed — so sink reads see one row per
  *     (file, key-in-file) regardless of where the kill landed.
  */
class StreamRecoverySpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def op(id: Long, user: Long, t: String, v: Double): String =
    s"""{"event_id":$id,"user_id":$user,"event_type":"$t","value":$v}"""

  private def land(landing: String, idx: Int, lines: Seq[String]): Unit = {
    val f = new java.io.File(landing, s"ops_$idx.json")
    Files.writeString(f.toPath, lines.mkString("\n"))
    assert(f.setLastModified(1700000000000L + idx * 60000L))
  }

  private def rawEmissions(outDir: String): Long =
    spark.read
      .schema("user_id LONG, seq LONG, last_op STRING, current_value DOUBLE, n_ops LONG")
      .json(outDir).count()

  private def materialized(outDir: String): Map[Long, (Double, String, Long)] =
    StreamCdc.materialize(spark, outDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Double]("current_value"), r.getAs[String]("last_op"),
          r.getAs[Long]("n_ops"))).toMap

  // one op per file; user 1 spans both phases, user 2 is deleted late
  private val files = Seq(
    Seq(op(1, 1, "signup", 10.0)),
    Seq(op(2, 1, "click", 20.0)),
    Seq(op(3, 2, "signup", 5.0)),
    Seq(op(4, 1, "click", 40.0)),
    Seq(op(5, 2, "error", 0.0)),
    Seq(op(6, 3, "signup", 7.0)))
  // n_ops(user 1) = 3 is the state-restoration witness: a resumed run
  // that lost its store would still land the correct newest value but
  // restart the count
  private val expectedFinal = Map(
    1L -> ((40.0, "U", 3L)),
    3L -> ((7.0, "I", 1L)))
  // one emission per (file, key present in it), exactly once
  private val expectedEmissions = 6L

  test("incremental AvailableNow resume restores per-key state from the checkpoint") {
    val landing = Files.createTempDirectory("graft-rec-landing").toString
    val outDir = Files.createTempDirectory("graft-rec-out").toString
    val ckpt = Files.createTempDirectory("graft-rec-ckpt").toString

    files.take(3).zipWithIndex.foreach { case (l, i) => land(landing, i, l) }
    val q1 = StreamCdc.start(spark, landing, outDir, ckpt)
    q1.awaitTermination()
    assert(materialized(outDir) === Map(
      1L -> ((20.0, "U", 2L)), 2L -> ((5.0, "I", 1L))))

    files.drop(3).zipWithIndex.foreach { case (l, i) => land(landing, i + 3, l) }
    val q2 = StreamCdc.start(spark, landing, outDir, ckpt)
    q2.awaitTermination()
    assert(materialized(outDir) === expectedFinal)
    assert(rawEmissions(outDir) === expectedEmissions,
      "resumed run re-emitted or skipped a landed file")
  }

  test("crash between micro-batches: restart neither drops nor duplicates emissions") {
    val landing = Files.createTempDirectory("graft-crash-landing").toString
    val outDir = Files.createTempDirectory("graft-crash-out").toString
    val ckpt = Files.createTempDirectory("graft-crash-ckpt").toString
    files.zipWithIndex.foreach { case (l, i) => land(landing, i, l) }

    // kill after the first committed micro-batch (maxFilesPerTrigger=1
    // gives one batch per file, so work is guaranteed to remain)
    val q1 = StreamCdc.start(spark, landing, outDir, ckpt)
    val deadline = System.currentTimeMillis + 60000
    while (q1.isActive && System.currentTimeMillis < deadline &&
      !q1.recentProgress.exists(_.numInputRows > 0)) Thread.sleep(50)
    q1.stop()

    val q2 = StreamCdc.start(spark, landing, outDir, ckpt)
    q2.awaitTermination()
    assert(materialized(outDir) === expectedFinal)
    assert(rawEmissions(outDir) === expectedEmissions,
      "crash-restart duplicated or dropped an emission")
  }
}
