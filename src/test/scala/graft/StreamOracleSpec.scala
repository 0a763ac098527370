package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sketches, TextOps}
import graft.streaming.StreamOracle

/** The driver-oracle streaming queries must agree with their batch
  * twins on identical input — the merge-law / determinism contracts the
  * class doc of [[StreamOracle]] states, pinned end to end on sf0.001.
  * (The driver gate hash-checks the same queries against DuckDB at
  * sf0.01; this spec is the JVM-local regression guard.)
  */
class StreamOracleSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("streamed CMS heavy hitters == batch heavy hitters") {
    val streamed = StreamOracle.cmsStream(spark, SparkT.Sf0001).collect().toSeq
    val batch = Sketches.cmsHeavyHitters(spark, SparkT.Sf0001).collect().toSeq
    assert(streamed == batch)
  }

  test("streamed histogram percentiles == batch read-off over same bounds") {
    val streamed = StreamOracle.histogramStream(spark, SparkT.Sf0001).collect().toSeq
    val cents = Tables.load(spark, SparkT.Sf0001, "lineitem")
      .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c"))
    val batch = Sketches.histogramPercentiles(cents,
      Sketches.centsHistogram(cents,
        Sketches.StreamHistLoCents, Sketches.StreamHistHiCents),
      Sketches.StreamHistLoCents, Sketches.StreamHistHiCents).collect().toSeq
    assert(streamed == batch)
    // the read-off is within one bin width of exact by construction
    val binWidth = (Sketches.StreamHistHiCents - Sketches.StreamHistLoCents + 1)
      .toDouble / Sketches.QuantileBins / 100.0
    streamed.foreach { r =>
      assert(r.getAs[Double]("abs_err") <= binWidth + 1e-9, s"row $r")
    }
  }

  test("streamed funnel preserves microseconds across the NDJSON landing " +
    "(second-straddling diffs)") {
    import java.sql.Timestamp
    // True view→click diff is 999_900 us = 0 whole seconds; a landing that
    // truncates to milliseconds would round view .000200→.000000 and click
    // 1.000100→1.000000, yielding a 1_000_000 us diff = 1 second. The
    // streamed row must agree with the batch fold on the FULL-precision
    // value — the same-hash stream/batch contract.
    val base = 1700000000000000L // epoch micros, on a second boundary
    def ts(us: Long) = { val t = new Timestamp(us / 1000); t.setNanos((us % 1000000).toInt * 1000); t }
    val rows = Seq(
      (1L, ts(base + 200L), 10L, "view", 0.0, "{}"),
      (2L, ts(base + 1000100L), 10L, "click", 0.0, "{}"),
      (3L, ts(base + 2000000L), 10L, "purchase", 0.0, "{}"),
      // control user: no straddle
      (4L, ts(base), 20L, "view", 0.0, "{}"),
      (5L, ts(base + 5000000L), 20L, "click", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel-straddle")
      .toString
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val streamed = StreamOracle.funnelStream(spark, dir).collect().toSeq
    val batch = graft.operators.Fleet.eventFunnel(spark, dir).collect().toSeq
    assert(streamed == batch)
    val u10 = streamed.find(_.getLong(0) == 10L).get
    assert(u10.getAs[Long]("view_to_click_secs") == 0L,
      s"ms-truncated landing detected: $u10")
  }

  test("streamed near-dup pair set == batch banded pair set (cap unbound)") {
    val streamed = StreamOracle.neardupStream(spark, SparkT.Sf0001)
      .select("doc_a", "doc_b", "jaccard").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = TextOps.minhashNearDup(spark, SparkT.Sf0001)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // with no bucket over MaxBandFrequency the online rule and the batch
    // retroactive cap admit exactly the same pairs
    assert(streamed == batch)
  }
}
