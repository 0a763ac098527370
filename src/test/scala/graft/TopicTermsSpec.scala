package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Topic labeling of the trained k-means cells (q_topic_terms): pins
  * the c-TF-IDF ranking laws the hash-compare can't express.
  */
class TopicTermsSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private lazy val rows =
    VectorOps.topicTerms(spark, SparkT.Sf0001).collect()

  test("ranks are contiguous from 1 and scores non-increasing per cluster") {
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Int]("cluster")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq ===
        (1 to byRank.length).toSeq)
      assert(byRank.length <= VectorOps.TopicTermsPerCluster)
      val scores = byRank.map(_.getAs[Double]("score")).toSeq
      assert(scores === scores.sorted.reverse)
    }
  }

  test("a token present in every cluster self-suppresses to score 0") {
    val k = rows.map(_.getAs[Int]("cluster")).distinct.length.toLong
    rows.filter(_.getAs[Long]("df_clusters") >= k)
      .foreach(r => assert(r.getAs[Double]("score") === 0.0))
    // and every positively-scored term is in strictly fewer clusters
    rows.filter(_.getAs[Double]("score") > 0)
      .foreach(r => assert(r.getAs[Long]("df_clusters") < k))
  }

  test("term frequencies are positive and ties broke on token bytes") {
    rows.foreach(r => assert(r.getAs[Long]("tf") >= 1L))
    rows.groupBy(_.getAs[Int]("cluster")).foreach { case (_, rs) =>
      rs.sortBy(_.getAs[Int]("rank")).sliding(2).foreach {
        case Array(a, b) =>
          if (a.getAs[Double]("score") == b.getAs[Double]("score"))
            assert(a.getAs[String]("token") < b.getAs[String]("token"))
        case _ =>
      }
    }
  }
}
