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
