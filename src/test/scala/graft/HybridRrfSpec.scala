package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusOps, VectorOps}

/** Hybrid dense+sparse RRF fusion (q_hybrid_rrf is the oracle hash
  * gate; these tests pin the fusion LAWS): channel-presence accounting,
  * the exact 1/(k+rank) arithmetic against a Scala recompute, and
  * dominance — an item ranked by both channels outscores any
  * single-channel item whose best rank is no better.
  */
class HybridRrfSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark
  private val dir = SparkT.Sf0001

  private def rrfOf(r: Option[Int]): BigDecimal =
    r.map { k =>
      BigDecimal(math.floor(1.0 / (CorpusOps.RrfK + k.toDouble) * 1e6 + 0.5) / 1e6)
        .setScale(6)
    }.getOrElse(BigDecimal(0).setScale(6))

  test("fusion law: rrf equals the recomputed channel sum; ranks contiguous; both-channel dominance") {
    val rows = CorpusOps.hybridRrf(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dr = Option(r.getAs[Integer]("dense_rank")).map(_.intValue)
      val sr = Option(r.getAs[Integer]("sparse_rank")).map(_.intValue)
      assert(dr.isDefined || sr.isDefined, "row with no contributing channel")
      dr.foreach(k => assert(k >= 1 && k <= VectorOps.TopK))
      sr.foreach(k => assert(k >= 1 && k <= CorpusOps.Bm25TopK))
      val expect = (rrfOf(dr) + rrfOf(sr)).toDouble
      assert(r.getAs[Double]("rrf") === expect,
        s"q=${r.getAs[Long]("q_id")} id=${r.getAs[Long]("id")}")
    }
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, g) =>
      val ranks = g.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks === (1 to ranks.length), s"q=$q ranks=$ranks")
      assert(ranks.length <= CorpusOps.HybridTopK)
      val byR = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("rrf"))
      assert(byR.zip(byR.tail).forall { case (a, b) => a >= b }, s"q=$q unsorted")
      // Dominance: a both-channel item beats any single-channel item
      // whose contributing rank is >= both of its ranks.
      val both = g.filter(r => r.getAs[Integer]("dense_rank") != null &&
        r.getAs[Integer]("sparse_rank") != null)
      val single = g.filter(r => r.getAs[Integer]("dense_rank") == null ||
        r.getAs[Integer]("sparse_rank") == null)
      for (b <- both; s <- single) {
        val bMax = math.max(b.getAs[Integer]("dense_rank").intValue,
          b.getAs[Integer]("sparse_rank").intValue)
        val sMin = Seq(Option(s.getAs[Integer]("dense_rank")),
          Option(s.getAs[Integer]("sparse_rank"))).flatten.map(_.intValue).min
        if (sMin >= bMax)
          assert(b.getAs[Double]("rrf") > s.getAs[Double]("rrf"))
      }
    }
  }

  test("query range: only ids with both a document and an embedding query (vec_id < NQueries)") {
    val qs = CorpusOps.hybridRrf(spark, dir).collect()
      .map(_.getAs[Long]("q_id")).toSet
    assert(qs.subsetOf((0L until VectorOps.NQueries.toLong).toSet))
  }
}
