package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Packing-manifest invariants: chunks are exactly full except the
  * last, no token is lost or duplicated, and the split flag marks
  * precisely the boundary-straddling docs.
  */
class DocPackingSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("every chunk full except the last; token mass preserved; splits flagged") {
    val m = TextOps.docPacking(spark, SparkT.Sf0001)
    val perChunk = m.groupBy("chunk_id")
      .agg(sum(col("tokens_in_chunk")).as("tok")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val last = perChunk.keys.max
    perChunk.foreach { case (c, tok) =>
      if (c < last) assert(tok == TextOps.PackCapacity, s"chunk $c has $tok")
      else assert(tok >= 1 && tok <= TextOps.PackCapacity)
    }
    // chunk ids are contiguous from 0
    assert(perChunk.keySet == (0L to last).toSet)

    val totalPacked = m.agg(sum(col("tokens_in_chunk"))).head().getLong(0)
    val totalDocs = Tables.load(spark, SparkT.Sf0001, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(totalPacked == totalDocs, "packing must neither lose nor duplicate tokens")

    // split flag <=> the doc appears in more than one chunk
    val byDoc = m.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max(col("is_split")).as("split"))
      .collect()
    byDoc.foreach { r =>
      assert((r.getLong(1) > 1) == r.getBoolean(2), s"row $r")
    }
  }

  test("docChunks: full coverage, exact stride, overlap only between neighbors") {
    val stride = TextOps.ChunkTokens - TextOps.ChunkOverlap
    val rows = TextOps.docChunks(spark, SparkT.Sf0001).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_.getAs[Int]("chunk_idx"))
      val n = sorted.head.getAs[Long]("n_tokens")
      // chunk idxs contiguous from 0; starts advance by exactly stride
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Int]("chunk_idx") === i, s"doc $doc")
        assert(r.getAs[Long]("start_tok") === i.toLong * stride, s"doc $doc")
        val end = r.getAs[Long]("end_tok")
        assert(end > r.getAs[Long]("start_tok") && end <= n, s"doc $doc chunk $i")
      }
      // the last chunk reaches the end of the document: nothing orphaned
      assert(sorted.last.getAs[Long]("end_tok") === n, s"doc $doc")
      // consecutive chunks overlap; non-consecutive never do
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_tok") < a.getAs[Long]("end_tok"),
            s"doc $doc: neighbors must overlap")
        case _ =>
      }
    }
  }
}
