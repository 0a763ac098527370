package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** The persisted-index contract (faiss write_index/read_index split):
  * training and encoding land on disk as parquet tables, and the
  * search side — run from the STORED artifacts with zero Lloyd
  * iterations — must reproduce the in-session [[VectorOps.annIvfPq]]
  * result exactly. The inverted lists are hive partitions by cell, so
  * the probed-cell restriction must reach the lists SCAN as dynamic
  * partition pruning — the IO shape that makes a persisted index
  * useful at all (a probe reads |cell| code rows, not the corpus).
  */
class IvfPqIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("search from the persisted index == the in-session IVF-PQ search") {
    val fromIndex = VectorOps.ivfPqIndexRoundtrip(spark, SparkT.Sf0001)
      .collect().map(_.toSeq).toSet
    val inSession = VectorOps.annIvfPq(spark, SparkT.Sf0001)
      .collect().map(_.toSeq).toSet
    assert(fromIndex.nonEmpty)
    assert(fromIndex === inSession)
  }

  test("the lists table is hive-partitioned by cell and the search scan prunes on it") {
    // self-contained: persist the index at the production path
    val base = java.nio.file.Paths.get(
      VectorOps.indexBase(SparkT.Sf0001))
    VectorOps.ivfPqPersist(spark, SparkT.Sf0001, base.toString)
    val cellDirs = base.resolve("lists").toFile.listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(cellDirs.nonEmpty, "lists/ has no cell= partition directories")

    // the cell restriction must be a PARTITION filter on the lists
    // scan — dynamic pruning from the broadcast probe side (the plan
    // carries a dynamicpruning expression in the scan's PartitionFilters)
    val plan = VectorOps.annIvfPqFromIndex(
      spark, SparkT.Sf0001, base.toString)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"lists scan is not dynamically pruned:\n$plan")
  }

  test("persist overwrites in place: a second build leaves one index, same result") {
    val r1 = VectorOps.ivfPqIndexRoundtrip(spark, SparkT.Sf0001)
      .collect().map(_.toSeq).toSet
    val r2 = VectorOps.ivfPqIndexRoundtrip(spark, SparkT.Sf0001)
      .collect().map(_.toSeq).toSet
    assert(r1 === r2)
  }
}
