package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches
import graft.streaming.StreamSketch

/** Streaming CMS maintenance: after streaming the corpus in
  * micro-batches, the running sketch must equal the one-shot batch
  * sketch of all keys cell-for-cell (the merge law end to end), and a
  * replayed batch id must not double-count.
  */
class StreamSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  /** Land `values` as 3 NDJSON files with deterministic mtimes so the
    * AvailableNow drain sees a stable micro-batch order.
    */
  private def land(landing: String, field: String, values: Seq[Long]): Unit =
    values.grouped(math.max(1, values.length / 3 + 1)).zipWithIndex.foreach {
      case (chunk, i) =>
        val f = new java.io.File(landing, s"chunk_$i.json")
        Files.writeString(f.toPath,
          chunk.map(v => s"""{"$field":$v}""").mkString("\n"))
        assert(f.setLastModified(1700000000000L + i * 60000L))
    }

  test("streamed sketch == batch sketch; replayed batch ids are skipped") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-cms-landing").toString
    val sketch = Files.createTempDirectory("graft-cms-sketch").toString
    val ckpt = Files.createTempDirectory("graft-cms-ckpt").toString

    val keys = Tables.load(spark, SparkT.Sf0001, "lineitem")
      .select(col("l_partkey").as("key")).as[Long].collect().toSeq
    land(landing, "key", keys)

    val q = StreamSketch.start(spark, landing, sketch, ckpt)
    assert(q.awaitTermination(120000L), "stream did not drain in time")

    def cellsOf(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
      df.collect().map(r => ((r.getAs[Int]("d"), r.getAs[Long]("bucket")),
        r.getAs[Long]("cnt"))).toMap

    val streamed = cellsOf(spark.read.parquet(s"$sketch/cells"))
    val batch = cellsOf(
      Sketches.cmsCells(keys.toDF("key")).select(
        col("d"), col("bucket"), col("cnt").cast("long").as("cnt")))
    assert(streamed == batch)

    // replay an already-merged batch id: sketch must not change
    StreamSketch.mergeInto(
      Sketches.cmsCells(Seq(1L, 2L, 3L).toDF("key")), batchId = 0L, dir = sketch)
    assert(cellsOf(spark.read.parquet(s"$sketch/cells")) == batch)
  }

  test("streamed HLL registers == batch registers; replayed ids skipped") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-hll-landing").toString
    val sketch = Files.createTempDirectory("graft-hll-sketch").toString
    val ckpt = Files.createTempDirectory("graft-hll-ckpt").toString

    val keys = Tables.load(spark, SparkT.Sf0001, "orders")
      .select(col("o_custkey").as("key")).as[Long].collect().toSeq
    land(landing, "key", keys)

    val q = StreamSketch.startHll(spark, landing, sketch, ckpt)
    assert(q.awaitTermination(120000L), "stream did not drain in time")

    def regsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Int]("m")).toMap

    val streamed = regsOf(spark.read.parquet(s"$sketch/regs"))
    val batch = regsOf(Sketches.hllRegisters(keys.toDF("key")))
    assert(streamed == batch)

    // replay: register table unchanged (and max-merge is idempotent anyway)
    StreamSketch.mergeRegistersInto(
      Sketches.hllRegisters(Seq(1L, 2L, 3L).toDF("key")), batchId = 0L, dir = sketch)
    assert(regsOf(spark.read.parquet(s"$sketch/regs")) == batch)
  }

  test("streamed KMV == batch KMV (union-sort-take-k merge in motion)") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-kmv-landing").toString
    val sketch = Files.createTempDirectory("graft-kmv-sketch").toString
    val ckpt = Files.createTempDirectory("graft-kmv-ckpt").toString

    val keys = Tables.load(spark, SparkT.Sf0001, "orders")
      .select(col("o_custkey").as("key")).as[Long].collect().toSeq
    land(landing, "key", keys)

    val q = StreamSketch.startKmv(spark, landing, sketch, ckpt)
    assert(q.awaitTermination(120000L), "stream did not drain in time")

    val streamed = spark.read.parquet(s"$sketch/kmv")
      .collect().map(_.getDouble(0)).sorted.toSeq
    val batch = Sketches.kmvSketch(keys.toDF("key"))
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(streamed == batch)
    assert(streamed.length <= Sketches.KmvK)
  }

  test("streamed histogram == batch histogram over the same fixed bounds") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-hist-landing").toString
    val sketch = Files.createTempDirectory("graft-hist-sketch").toString
    val ckpt = Files.createTempDirectory("graft-hist-ckpt").toString

    val cents = Tables.load(spark, SparkT.Sf0001, "lineitem")
      .selectExpr("CAST(floor(l_extendedprice * 100 + 0.5) AS LONG) AS c")
      .as[Long].collect().toSeq
    // fixed bounds narrower than the data, so the clamp path is hit too
    val (lo, hi) = (cents.min + 1000, cents.max - 1000)
    land(landing, "c", cents)

    val q = StreamSketch.startHistogram(spark, landing, sketch, ckpt, lo, hi)
    assert(q.awaitTermination(120000L), "stream did not drain in time")

    def cellsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("cnt")).toMap

    val streamed = cellsOf(spark.read.parquet(s"$sketch/hist"))
    val batch = cellsOf(Sketches.centsHistogram(cents.toDF("c"), lo, hi)
      .select(col("bin"), col("cnt").cast("long").as("cnt")))
    assert(streamed == batch)
    assert(streamed.values.sum == cents.length) // clamped rows still counted
    assert(streamed.keySet.max <= Sketches.QuantileBins - 1 && streamed.keySet.min >= 0)
  }
}
