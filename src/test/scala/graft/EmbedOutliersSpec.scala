package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Embedding outlier pruning (q_embed_outliers): pins the filter laws —
  * total coverage, the verdict is exactly the mean-kNN-cosine rule,
  * aggregates agree with the kNN graph row, lonely vectors flag with
  * NULL mean.
  */
class EmbedOutliersSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private lazy val rows =
    VectorOps.embedOutliers(spark, SparkT.Sf0001).collect()

  private lazy val graph =
    VectorOps.knnGraph(spark, SparkT.Sf0001).collect()

  test("total coverage, verdict rule, agreement with the kNN graph") {
    val n = spark.read.parquet(s"${SparkT.Sf0001}/embeddings.parquet").count()
    assert(rows.length.toLong === n)
    val byVec = graph.groupBy(_.getAs[Long]("vec_id"))
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val nn = r.getAs[Long]("n_neighbors")
      val mean = Option(r.getAs[Double]("mean_knn_cos"))
      val edges = byVec.getOrElse(id, Array.empty)
      assert(nn === edges.length.toLong)
      assert(nn <= VectorOps.KnnK.toLong)
      if (nn == 0) {
        assert(r.isNullAt(r.fieldIndex("mean_knn_cos")))
        assert(r.getAs[Boolean]("is_outlier"))
      } else {
        val exp = edges.map(_.getAs[Double]("cos_sim")).sum / edges.length
        assert(math.abs(mean.get - exp) < 1e-6)
        assert(r.getAs[Boolean]("is_outlier") ===
          (mean.get < VectorOps.OutlierMinCos))
        assert(mean.get >= -1.0 - 1e-9 && mean.get <= 1.0 + 1e-9)
      }
    }
    // the rule is non-trivial on the test corpus: both verdicts occur
    assert(rows.exists(_.getAs[Boolean]("is_outlier")))
    assert(rows.exists(!_.getAs[Boolean]("is_outlier")))
  }
}
