package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** The SemDeDup oversized-cell guard: a deliberately hot cell must
  * contribute ZERO pairs (bounding the Σ|cell|² budget), while the
  * non-hot cells answer exactly as the unguarded run does.
  */
class SemDedupGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("hot cell is excluded, non-hot cells unchanged, budget bounded") {
    import spark.implicits._
    val maxCell = 5
    // cell 1: 8 identical vectors (> maxCell, every pair a near-dup if
    // compared); cell 2: 3 identical vectors (pairs must survive)
    val hotRows = (0L until 8L).map(i => (1L, i, Seq(1.0f, 0.0f, 0.0f)))
    val okRows = (10L until 13L).map(i => (2L, i, Seq(0.0f, 1.0f, 0.0f)))
    val a = (hotRows ++ okRows).toDF("cluster", "vec_id", "embedding")

    val guarded = VectorOps.semDedupPairsOn(a, maxCell).collect()
    assert(guarded.forall(_.getAs[Long]("cell") == 2L),
      "no pair may come from the hot cell")
    // 3 identical vectors -> exactly 3 within-cell pairs
    assert(guarded.length == 3)
    assert(guarded.forall(_.getAs[Double]("cos_sim") == 1.0))

    // budget bound: pair count <= sum over non-hot cells of n*(n-1)/2
    assert(guarded.length <= 3 * 2 / 2)

    // the unguarded run restricted to non-hot cells gives the same rows
    val unguarded = VectorOps.semDedupPairsOn(a, Int.MaxValue)
      .filter(col("cell") === 2L).collect()
    assert(guarded.map(_.toString).sorted.toSeq ==
      unguarded.map(_.toString).sorted.toSeq)
    // and WOULD have paid the hot cell's quadratic budget
    assert(VectorOps.semDedupPairsOn(a, Int.MaxValue).count() == 8 * 7 / 2 + 3)
  }
}
