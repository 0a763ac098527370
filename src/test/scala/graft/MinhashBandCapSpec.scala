package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** The MinHash-LSH hot-band frequency cap (TextOps.MaxBandFrequency):
  * band buckets holding more than the cap are dropped before the
  * candidate self-join — the mitigation for boilerplate-heavy shingle
  * skew whose f² pair blowup would dominate the join at 100 TB.
  *
  * The synthetic corpus makes the cap provably bind: identical docs
  * share ALL their band buckets, so a clone group larger than the cap
  * floods every one of its buckets past the threshold.
  */
class MinhashBandCapSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def corpus(nClones: Int) = {
    import spark.implicits._
    val cloneText = "alpha beta gamma delta epsilon zeta eta theta"
    val clones = (1 to nClones).map(i => (100L + i, cloneText))
    // a genuine near-dup pair, disjoint from the clones: 3 shared
    // shingles of 5 distinct => exact Jaccard 0.6 >= threshold
    val pair = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five seven"))
    (clones ++ pair).toDF("doc_id", "text")
  }

  private def pairsOf(nClones: Int): Set[(Long, Long)] =
    TextOps.nearDupPairsFrom(corpus(nClones)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

  test("below the cap, clone pairs and the genuine pair are all found") {
    val n = 10 // bucket frequency 10 <= MaxBandFrequency
    assert(n <= TextOps.MaxBandFrequency)
    val pairs = pairsOf(n)
    assert(pairs.contains((1L, 2L)))
    // all n*(n-1)/2 clone pairs present
    val clonePairs = pairs.filter { case (a, b) => a > 100 && b > 100 }
    assert(clonePairs.size === n * (n - 1) / 2)
  }

  test("above the cap, the hot band's pairs are dropped; others survive") {
    val n = TextOps.MaxBandFrequency + 10 // every clone bucket over cap
    val pairs = pairsOf(n)
    // the clone group floods all 8 of its buckets past the cap -> no
    // candidate stage, no pairs among clones
    assert(!pairs.exists { case (a, b) => a > 100 && b > 100 })
    // the small, discriminative buckets are untouched
    assert(pairs.contains((1L, 2L)))
  }

  test("band stats expose cap pressure on the real corpus (cap not binding)") {
    val stats = TextOps.minhashBandStats(spark, SparkT.Sf0001).collect()
    assert(stats.length === TextOps.Bands)
    stats.foreach { r =>
      assert(r.getAs[Long]("n_hot_buckets") === 0L)
      assert(r.getAs[Long]("n_docs_capped") === 0L)
      assert(r.getAs[Long]("max_bucket") <= TextOps.MaxBandFrequency)
    }
  }
}
