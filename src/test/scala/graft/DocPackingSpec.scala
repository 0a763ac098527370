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
}
