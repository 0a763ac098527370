package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** The incremental-dedup write-back chain: a batch-2 doc duplicating a
  * batch-1 ADMISSION must be rejected (the index grew), while the same
  * doc against the original corpus would have been admitted — plus the
  * delta-only file contract of the write-back and the final index
  * content.
  */
class IncrementalDedupChainSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("write-back chain rejects batch-2 duplicate of a batch-1 admission") {
    import spark.implicits._
    // residues mod 10: corpus {0,0,2}, batch 1 {1,1}, batch 2 {3,3}
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (20L, "one two three four five six"),
      (12L, "red green blue cyan magenta yellow"),
      (11L, "lorem ipsum dolor sit amet consectetur"), // unique -> admitted
      (21L, "alpha beta gamma delta epsilon zeta"),    // dup of corpus 10
      (13L, "lorem ipsum dolor sit amet consectetur"), // dup of ADMITTED 11
      (23L, "totally different words arrive here now")
    ).toDF("doc_id", "text")
    val indexDir =
      Files.createTempDirectory("graft-incchain").toString + "/index"

    val rows = TextOps.incrementalDedupChainOn(docs, indexDir).collect()
    val decision = rows.map(r =>
      (r.getAs[Int]("batch_no"), r.getAs[Long]("doc_id")) ->
        r.getAs[Boolean]("admitted")).toMap

    assert(decision == Map(
      (1, 11L) -> true, (1, 21L) -> false,
      (2, 13L) -> false, (2, 23L) -> true))

    // doc 13 was condemned by the write-back alone (its only match is
    // batch-1 doc 11, an exact dup -> jaccard 1.0)
    val r13 = rows.find(r => r.getAs[Long]("doc_id") == 13L).get
    assert(r13.getAs[Long]("n_matches") == 1L)
    assert(r13.getAs[Double]("best_jaccard") == 1.0)

    // the final index = corpus + the admissions of BOTH batches, and the
    // delta-only invariant inside the write-back did not throw
    val indexed = spark.read.parquet(indexDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(indexed == Set(10L, 20L, 12L, 11L, 23L))
  }
}
