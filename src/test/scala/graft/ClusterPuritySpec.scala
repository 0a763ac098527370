package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Cluster-purity evaluation (q_cluster_purity): conservation and
  * consistency laws of the per-cell metric rows.
  */
class ClusterPuritySpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private lazy val rows =
    VectorOps.clusterPurity(spark, SparkT.Sf0001).collect()

  test("cells conserve the corpus and majority counts are consistent") {
    val total = spark.read
      .parquet(s"${SparkT.Sf0001}/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n_members")).sum === total)
    rows.foreach { r =>
      val (m, mj, nl) = (r.getAs[Long]("n_members"),
        r.getAs[Long]("n_majority"), r.getAs[Long]("n_labels"))
      assert(mj >= 1L && mj <= m && nl >= 1L)
      // majority must be at least an equal share of the cell
      assert(mj * nl >= m)
      val p = r.getAs[Double]("purity")
      assert(p > 0.0 && p <= 1.0)
      // purity 1 exactly when the cell is single-label
      assert((p == 1.0) === (nl == 1L))
    }
  }
}
