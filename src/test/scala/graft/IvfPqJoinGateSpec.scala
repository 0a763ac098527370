package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** The IVF-PQ candidate-join size gate: below the ceiling the scoring
  * join broadcasts (no shuffle of the code table), above it (forced
  * with ceiling 0) it degrades to a shuffle join on vec_id — and the
  * two regimes return IDENTICAL results.
  */
class IvfPqJoinGateSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("below ceiling: candidate join broadcasts (no shuffle join anywhere)") {
    val df = VectorOps.annIvfPq(spark, SparkT.Sf0001)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"candidate join must broadcast under the ceiling:\n$plan")
  }

  test("above ceiling: scoring join shuffles on vec_id, same answer") {
    val gated = VectorOps.annIvfPqWithCeiling(spark, SparkT.Sf0001, 0L)
    val plan = planOf(gated)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"ceiling 0 must force a shuffle join for the candidate set:\n$plan")
    val expected = VectorOps.annIvfPq(spark, SparkT.Sf0001).collect().toSeq
    assert(gated.collect().toSeq == expected,
      "join strategy must not change the result")
  }
}
