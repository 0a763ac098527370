package graft

import org.apache.spark.sql.types.{ArrayType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Parsing

/** The typed `Dataset[AnalyzeResult]` surface (SURVEY §1.3's design
  * promise): the nested case-class document assembly must carry the
  * reference's AnalyzeResult shape (sellers ArrayType(StructType) +
  * stats struct) and recompose into the EXACT q_analyze_pipeline row —
  * the DataFrame aggregate and the typed per-document fold are two
  * derivations of the same numbers.
  */
class TypedAnalyzeSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("typed pipeline row hash-equals the DataFrame pipeline row") {
    val typed = Parsing.analyzePipelineTyped(spark, SparkT.Sf0001)
      .collect().map(_.toSeq)
    val frame = Parsing.analyzePipeline(spark, SparkT.Sf0001)
      .collect().map(_.toSeq)
    assert(typed.length === 1)
    assert(typed.toSeq === frame.toSeq)
  }

  test("the document Dataset has the promised nested shape and consistent stats") {
    val ds = Parsing.analyzeResults(spark, SparkT.Sf0001)
    val schema = ds.schema
    val sellers = schema("sellers").dataType.asInstanceOf[ArrayType]
    assert(sellers.elementType.isInstanceOf[StructType])
    assert(schema("stats").dataType.isInstanceOf[StructType])

    val docs = ds.collect()
    assert(docs.nonEmpty)
    docs.foreach { d =>
      assert(d.sellers.nonEmpty)
      assert(d.stats.n_offers === d.sellers.length.toLong)
      assert(d.stats.n_bots === d.sellers.count(_.is_bot).toLong)
      assert(d.stats.min_price === d.sellers.map(_.price).min)
      assert(d.stats.spread === d.stats.max_price - d.stats.min_price)
      // sellers arrive sorted by the merge key — the document is
      // deterministic regardless of shuffle order
      assert(d.sellers.map(_.seller_key) ===
        d.sellers.map(_.seller_key).sorted)
    }
  }
}
