package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** Source-level curation (q_source_curation): pins the verdict
  * semantics the hash-compare can't express — a republishing source is
  * dropped, a clean one kept, cross-source republishing counts against
  * BOTH sources, and the per-source doc counts conserve the corpus.
  */
class SourceCurationSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def run(docs: (Long, String, String)*) = {
    import spark.implicits._
    CorpusOps.sourceCurationFrom(docs.toDF("doc_id", "source", "text"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("dup_docs"),
          r.getAs[Double]("dup_rate"), r.getAs[Boolean]("keep"))))
      .toMap
  }

  // enough distinct tokens that the quality score clears the floor
  private def uniq(tag: String): String =
    (1 to 30).map(i => s"$tag$i").mkString(" ")

  test("a republishing source is dropped; a clean source is kept") {
    val clone = uniq("c")
    val out = run(
      (1L, "mill", clone), (2L, "mill", clone), (3L, "mill", clone),
      (4L, "clean", uniq("a")), (5L, "clean", uniq("b")),
      (6L, "clean", uniq("d")))
    assert(out("mill") === ((3L, 3L, 1.0, false)))
    assert(out("clean")._2 === 0L)
    assert(out("clean")._4 === true)
  }

  test("cross-source republishing counts against both sources") {
    val shared = uniq("s")
    // one doc each: the shared text makes BOTH dup_docs=1, dup_rate=1
    val out = run((1L, "x", shared), (2L, "y", shared))
    assert(out("x") === ((1L, 1L, 1.0, false)))
    assert(out("y") === ((1L, 1L, 1.0, false)))
  }

  test("bag-of-words normalization: reordered tokens are the same document") {
    val out = run(
      (1L, "perm", "alpha beta gamma delta " + uniq("p")),
      (2L, "perm", uniq("p") + " delta gamma beta alpha"))
    assert(out("perm")._2 === 2L)
  }

  test("sf0.001 corpus: counts conserve and both verdicts appear") {
    val rows = CorpusOps.sourceCuration(spark, SparkT.Sf0001).collect()
    val total = spark.read
      .parquet(s"${SparkT.Sf0001}/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    val verdicts = rows.map(_.getAs[Boolean]("keep")).toSet
    assert(verdicts === Set(true, false),
      "thresholds should split the synthetic sources into keep AND drop")
  }
}
