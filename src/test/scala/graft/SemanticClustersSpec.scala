package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Mutual-kNN semantic clustering (q_semantic_clusters): pins the
  * clustering laws the hash gate can't state — total coverage (every
  * vector labeled exactly once), label canonicality (cluster_id is the
  * component MINIMUM and itself a member), size consistency, and that
  * the partition is EXACTLY the transitive closure of the reciprocal
  * kNN edges (no mutual edge crosses clusters; singletons have no
  * mutual edge).
  */
class SemanticClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private lazy val rows =
    VectorOps.semanticClusters(spark, SparkT.Sf0001).collect()

  private lazy val label: Map[Long, Long] = rows.map(r =>
    r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap

  private lazy val mutualEdges: Set[(Long, Long)] = {
    val g = VectorOps.knnGraph(spark, SparkT.Sf0001).collect()
    g.filter(_.getAs[Boolean]("reciprocal"))
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id")))
      .toSet
  }

  test("every vector is labeled exactly once, sizes match, min-id canonical") {
    val n = spark.read.parquet(s"${SparkT.Sf0001}/embeddings.parquet").count()
    assert(rows.length.toLong === n)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length === rows.length)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, ms) =>
      val ids = ms.map(_.getAs[Long]("vec_id"))
      assert(ids.min === cid) // canonical = member minimum
      ms.foreach { m =>
        assert(m.getAs[Long]("cluster_size") === ids.length.toLong)
        assert(m.getAs[Boolean]("clustered") === (ids.length > 1))
      }
    }
  }

  test("the partition is the transitive closure of the mutual edges") {
    // no mutual edge crosses clusters
    mutualEdges.foreach { case (a, b) => assert(label(a) === label(b)) }
    // multi-member clusters are connected via mutual edges: every
    // non-canonical member reaches its cluster through SOME mutual edge
    val touched = mutualEdges.flatMap(e => Seq(e._1, e._2))
    rows.filter(_.getAs[Boolean]("clustered")).foreach { r =>
      assert(touched.contains(r.getAs[Long]("vec_id")))
    }
    // singletons have no mutual edge at all
    rows.filterNot(_.getAs[Boolean]("clustered")).foreach { r =>
      assert(!touched.contains(r.getAs[Long]("vec_id")))
    }
    // and the clustering is non-trivial on the test corpus
    assert(rows.exists(_.getAs[Boolean]("clustered")))
    assert(rows.exists(!_.getAs[Boolean]("clustered")))
  }
}
