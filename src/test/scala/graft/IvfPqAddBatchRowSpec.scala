package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** The add-only steady-state row (q_ann_index_add_batch): the first
  * call per corpus may build the base index, every later call must SKIP
  * the build — zero Lloyd iterations — and pay only the add verb (one
  * broadcast assign + one broadcast encode over the arriving batch) plus
  * the two-scan DPP search. The result must be row-identical to the
  * build-composite add row (same quantizer training set, same batch),
  * which is what lets it ride q_ann_index_add's oracle SQL.
  */
class IvfPqAddBatchRowSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark
  private val dir = SparkT.Sf0001

  test("repeat calls compose ZERO Lloyd (build runs at most once); result == add row") {
    val first = VectorOps.ivfPqIndexAddBatchRow(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(first.nonEmpty)

    VectorOps.LloydMeter.reset()
    val second = VectorOps.ivfPqIndexAddBatchRow(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(VectorOps.LloydMeter.iterations.get() === 0L,
      "a repeat call re-trained a quantizer — the benched repeats would be build+add")
    assert(second === first)

    // same training set (base corpus), same arriving batch — the
    // steady-state row and the build composite must agree row-for-row
    val composite = VectorOps.ivfPqIndexAdd(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(second === composite)
  }

  test("the steady-state plan keeps BOTH lists scans pruned to the probed cells") {
    VectorOps.ivfPqIndexAddBatchRow(spark, dir).collect()
    val plan = VectorOps.ivfPqIndexAddBatchRow(spark, dir)
      .queryExecution.executedPlan.toString
    val prunes = "dynamicpruning".r.findAllIn(plan).size
    assert(prunes >= 2,
      s"expected base + delta scans pruned, found $prunes:\n$plan")
  }

  test("delta neighbors surface in the top-k (the add is exercised every repeat)") {
    val r = VectorOps.ivfPqIndexAddBatchRow(spark, dir)
    assert(r.filter(col("from_delta")).count() > 0,
      "no added vector reached any query's top-k")
  }
}
