package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** The index-observability row (q_ann_index_stats): per-cell occupancy
  * and the faiss imbalance factor over the STORED inverted lists. The
  * exact values are oracle-gated; here the structural laws — counts
  * cover the corpus exactly once, shares are a distribution, the
  * imbalance factor is a global ≥ 1 constant, and the read rides the
  * serving rows' build-at-most-once gate (zero Lloyd on a warm call).
  */
class IvfPqStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark
  private val dir = SparkT.Sf0001

  test("occupancies cover the corpus once; shares sum to 1; imbalance is a global >= 1 constant") {
    val rows = VectorOps.ivfPqIndexStats(spark, dir).collect()
    assert(rows.nonEmpty)
    val n = VectorOps.embDistributed(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum === n,
      "per-cell counts do not cover the corpus exactly once")
    val shareSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    val imb = rows.map(_.getDouble(3)).distinct
    assert(imb.size === 1, s"imbalance differs across rows: $imb")
    assert(imb.head >= 1.0, s"imbalance factor ${imb.head} below 1")
  }

  test("a warm stats call composes ZERO Lloyd iterations (stored-lists read only)") {
    VectorOps.ivfPqIndexStats(spark, dir).collect()
    VectorOps.LloydMeter.reset()
    VectorOps.ivfPqIndexStats(spark, dir).collect()
    assert(VectorOps.LloydMeter.iterations.get() === 0L,
      "the stats read rebuilt the index")
  }
}
