package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Library hygiene: operators that persist() working frames must
  * release them before returning — a long-lived session calling them
  * repeatedly must not accumulate cached blocks (the harness's
  * clearCache() between queries is a belt, not the contract).
  */
class CacheHygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def assertCacheEmpty(what: String): Unit =
    assert(spark.sharedState.cacheManager.isEmpty,
      s"$what left cached frames behind")

  test("minhashNearDup releases its shingle base") {
    spark.catalog.clearCache()
    val n = TextOps.minhashNearDup(spark, SparkT.Sf0001).count()
    assert(n >= 0)
    assertCacheEmpty("minhashNearDup")
  }

  test("nearDupClusters releases pair and label frames") {
    spark.catalog.clearCache()
    val n = TextOps.nearDupClusters(spark, SparkT.Sf0001).count()
    assert(n >= 0)
    assertCacheEmpty("nearDupClusters")
  }

  test("langId releases the trigram explode") {
    spark.catalog.clearCache()
    val n = TextOps.langId(spark, SparkT.Sf0001).count()
    assert(n > 0)
    assertCacheEmpty("langId")
  }

  test("round-5 curation and PQ builders release their working frames") {
    for ((what, run) <- Seq[(String, () => Long)](
        ("ngramJaccardNearDup", () => TextOps.ngramJaccardNearDup(spark, SparkT.Sf0001).count()),
        ("decontamOverlap", () => TextOps.decontamOverlap(spark, SparkT.Sf0001).count()),
        ("repetitionStats", () => TextOps.repetitionStats(spark, SparkT.Sf0001).count()),
        ("annPq", () => graft.operators.VectorOps.annPq(spark, SparkT.Sf0001).count()))) {
      spark.catalog.clearCache()
      assert(run() > 0)
      assertCacheEmpty(what)
    }
  }

  test("shared-passage builder releases its fingerprint index frame") {
    spark.catalog.clearCache()
    val n = graft.operators.CorpusOps.sharedPassages(spark, SparkT.Sf0001).count()
    assert(n > 0)
    assertCacheEmpty("sharedPassages")
  }
}
