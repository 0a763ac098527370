package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopK
import graft.operators.TopK.{Offer, Wrap}

/** Bounded top-k aggregator laws: the merge must be associative,
  * commutative and K-bounded for partial aggregation / AQE / retries to
  * be safe at any scale, and the aggregated query must equal the
  * window-rank twin (also pinned end-to-end by the shared oracle SQL of
  * q_top3_agg and q_top3_cheapest_per_sku).
  */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def randOffer(rnd: scala.util.Random): Offer =
    Offer(1.0 + rnd.nextInt(50), 1L + rnd.nextInt(5),
      1L + rnd.nextInt(1000), 1L + rnd.nextInt(7))

  private def randWrap(rnd: scala.util.Random): Wrap =
    (0 until rnd.nextInt(10)).foldLeft(TopK.agg.zero)(
      (b, _) => TopK.agg.reduce(b, randOffer(rnd)))

  test("merge is associative, commutative, K-bounded") {
    val rnd = new scala.util.Random(13)
    val m = TopK.agg.merge _
    (1 to 300).foreach { _ =>
      val (a, b, c) = (randWrap(rnd), randWrap(rnd), randWrap(rnd))
      assert(m(a, b) == m(b, a))
      assert(m(m(a, b), c) == m(a, m(b, c)))
      assert(m(a, b).offers.length <= TopK.K)
      assert(m(a, b).offers == m(a, b).offers.sorted(TopK.offerOrd))
    }
  }

  test("reduce equals merging a singleton") {
    val rnd = new scala.util.Random(17)
    (1 to 300).foreach { _ =>
      val (b, o) = (randWrap(rnd), randOffer(rnd))
      assert(TopK.agg.reduce(b, o) ==
        TopK.agg.merge(b, TopK.agg.reduce(TopK.agg.zero, o)))
    }
  }

  test("aggregated top-3 equals the window-rank twin") {
    val agg = TopK.top3Agg(spark, SparkT.Sf0001).collect().map(_.toString).toSeq
    val win = operators.Relational.top3CheapestPerSku(spark, SparkT.Sf0001)
      .collect().map(_.toString).toSeq
    assert(agg.nonEmpty)
    assert(agg == win)
  }
}
