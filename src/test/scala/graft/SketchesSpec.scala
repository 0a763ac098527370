package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Count-min sketch laws, checked exhaustively on the small corpus:
  * estimates never undercount ANY key (not just the probed top-N), and
  * the sketch of a union is the cell-wise sum of the parts' sketches —
  * the mergeability that makes CMS map-side combinable at stream scale.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def keysOf(dir: String) =
    Tables.load(spark, dir, "lineitem").select(col("l_partkey").as("key"))

  test("estimate >= true count for every distinct key") {
    val keys = keysOf(SparkT.Sf0001)
    val cells = Sketches.cmsCells(keys)
    val truth = keys.groupBy("key").agg(count(lit(1)).as("true_count"))
    val joined = Sketches.cmsEstimates(keys, cells)
      .join(truth, Seq("key")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("true_count"),
        s"undercount on ${r.getAs[Long]("key")}")
    }
  }

  test("sketch of a union is the cell-wise sum of the parts (merge law)") {
    val keys = keysOf(SparkT.Sf0001)
    val a = keys.filter(col("key") % 2 === 0)
    val b = keys.filter(col("key") % 2 =!= 0)
    val merged = Sketches.cmsCells(a)
      .unionByName(Sketches.cmsCells(b))
      .groupBy("d", "bucket").agg(sum(col("cnt")).as("cnt"))
    val whole = Sketches.cmsCells(keys)
    val diff = merged.join(whole.withColumnRenamed("cnt", "cnt_whole"),
        Seq("d", "bucket"), "full")
      .filter(col("cnt").isNull || col("cnt_whole").isNull ||
        col("cnt") =!= col("cnt_whole"))
    assert(diff.count() == 0)
  }
}
