package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.streaming.StreamCdc

/** Streaming CDC compaction: the materialized stream state must equal
  * the batch compaction over identical input, whatever the batch
  * split — including late-arriving OLDER sequence numbers, which must
  * neither win the key nor disturb the op count.
  */
class StreamCdcSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def runStream(files: Seq[Seq[String]]): Map[Long, (Double, String, Long)] = {
    val landing = Files.createTempDirectory("graft-cdc-landing").toString
    val outDir = Files.createTempDirectory("graft-cdc-out").toString
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    files.zipWithIndex.foreach { case (lines, i) =>
      val f = new java.io.File(landing, s"ops_$i.json")
      Files.writeString(f.toPath, lines.mkString("\n"))
      assert(f.setLastModified(1700000000000L + i * 60000L))
    }
    val q = StreamCdc.start(spark, landing, outDir, ckpt)
    q.awaitTermination()
    StreamCdc.materialize(spark, outDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Double]("current_value"), r.getAs[String]("last_op"),
          r.getAs[Long]("n_ops"))).toMap
  }

  private def op(id: Long, user: Long, t: String, v: Double): String =
    s"""{"event_id":$id,"user_id":$user,"event_type":"$t","value":$v}"""

  test("final state is batch-split invariant, late old ops don't win") {
    // user 1: I(1) U(2) U(3); user 2: I(4) D(5); user 3: I(6)
    val ops = Seq(
      op(1, 1, "signup", 10.0), op(2, 1, "click", 20.0), op(3, 1, "click", 30.0),
      op(4, 2, "signup", 1.0), op(5, 2, "error", 0.0),
      op(6, 3, "signup", 7.0))
    val expected = Map(
      1L -> ((30.0, "U", 3L)),
      3L -> ((7.0, "I", 1L)))
    // one file vs. per-op files vs. an adversarial split that delivers
    // user 1's NEWEST op first and the older ones late
    assert(runStream(Seq(ops)) === expected)
    assert(runStream(ops.map(Seq(_))) === expected)
    val lateOld = Seq(
      Seq(op(3, 1, "click", 30.0), op(4, 2, "signup", 1.0)),
      Seq(op(1, 1, "signup", 10.0), op(5, 2, "error", 0.0)),
      Seq(op(2, 1, "click", 20.0), op(6, 3, "signup", 7.0)))
    assert(runStream(lateOld) === expected)
  }

  test("streamed materialization == batch compaction on the real events table") {
    val batch = Relational.cdcCompact(spark, SparkT.Sf0001).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Double]("current_value"), r.getAs[String]("last_op"),
          r.getAs[Long]("n_ops"))).toMap
    val streamed = graft.streaming.StreamOracle.cdcStream(spark, SparkT.Sf0001)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Double]("current_value"), r.getAs[String]("last_op"),
          r.getAs[Long]("n_ops"))).toMap
    assert(streamed === batch)
  }
}
