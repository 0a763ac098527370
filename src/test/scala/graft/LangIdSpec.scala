package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Language-ID over the derived per-language orthography measures REAL
  * separation: full-length docs classify perfectly (they carry far more
  * trigrams than profile overlap can tie), and the failure mode is
  * recoverable — truncating docs to a few characters starves the
  * profiles and misclassifications appear.
  */
class LangIdSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def offDiagonal(df: org.apache.spark.sql.DataFrame): Long =
    df.filter(col("actual_lang") =!= col("predicted_lang"))
      .agg(coalesce(sum(col("n_docs")), lit(0L))).head().getLong(0)

  test("full docs: perfect diagonal; starved docs: real misclassification") {
    val docs = Tables.load(spark, SparkT.Sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    assert(offDiagonal(TextOps.langIdOn(docs)) == 0L,
      "full-length docs must classify perfectly under distinct orthographies")

    val starved = docs.withColumn("text", substring(col("text"), 1, 8))
    assert(offDiagonal(TextOps.langIdOn(starved)) > 0L,
      "8-char docs must misclassify sometimes — separation is measured, not vacuous")
  }
}
