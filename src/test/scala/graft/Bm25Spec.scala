package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** BM25 more-like-this retrieval (q_bm25_mlt is the oracle hash gate;
  * these tests pin the ranking SEMANTICS a hash-compare can't express):
  * term-coverage dominance, length normalization, and the structural
  * contract of the top-k output on the real corpus.
  */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = SparkT.spark
  private val dir = SparkT.Sf0001

  test("planted corpus: coverage beats partial match, short beats long at equal coverage") {
    import spark.implicits._
    // doc 0 is the only query doc (id < Bm25Queries); its top-3 TF-IDF
    // keywords are exactly {zebra, yak, xylophone} ("pad" is in every
    // doc -> idf 0 -> score 0). Candidates:
    //   10: all 3 query terms, short        -> rank 1
    //   13: all 3 query terms, 10x longer   -> rank 2 (length norm)
    //   11: one query term                  -> rank 3
    //   12: no query terms                  -> absent
    val docs = Seq(
      0L  -> "zebra yak xylophone pad pad",
      10L -> "zebra yak xylophone pad",
      11L -> ("yak pad pad"),
      12L -> "pad pad",
      13L -> ("zebra yak xylophone " + Seq.fill(27)("pad").mkString(" "))
    ).toDF("doc_id", "text")
    val rows = CorpusOps.bm25MoreLikeThisOn(docs).collect()
    assert(rows.map(_.getAs[Long]("q_id")).toSet === Set(0L))
    val byRank = rows.sortBy(_.getAs[Int]("rank"))
    assert(byRank.map(_.getAs[Long]("doc_id")).toSeq === Seq(10L, 13L, 11L))
    assert(byRank.map(_.getAs[Long]("n_terms")).toSeq === Seq(3L, 3L, 1L))
    val scores = byRank.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a > b },
      s"bm25 not strictly decreasing: ${scores.mkString(", ")}")
  }

  test("real corpus: ranks contiguous from 1, scores non-increasing, never self, n_terms bounded") {
    val rows = CorpusOps.bm25MoreLikeThis(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("q_id") !== r.getAs[Long]("doc_id"))
      val nt = r.getAs[Long]("n_terms")
      assert(nt >= 1L && nt <= graft.operators.TextOps.KeywordsPerDoc.toLong)
    }
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, g) =>
      val ranks = g.map(_.getAs[Int]("rank")).sorted
      assert(ranks.toSeq === (1 to ranks.length).toSeq, s"q=$q ranks=$ranks")
      assert(ranks.length <= CorpusOps.Bm25TopK)
      val byR = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("bm25"))
      assert(byR.zip(byR.tail).forall { case (a, b) => a >= b }, s"q=$q not sorted")
    }
  }
}
