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

  test("KMV of a union is union-sort-take-k of the parts (merge law)") {
    val keys = keysOf(SparkT.Sf0001)
    val a = keys.filter(col("key") % 2 === 0)
    val b = keys.filter(col("key") % 2 =!= 0)
    val merged = Sketches.kmvSketch(a).unionByName(Sketches.kmvSketch(b))
      .distinct().orderBy(col("u")).limit(Sketches.KmvK)
      .collect().map(_.getDouble(0)).toSeq
    val whole = Sketches.kmvSketch(keys)
      .collect().map(_.getDouble(0)).toSeq
    assert(merged == whole)
  }

  test("HLL registers of a union are the bucket-wise max of the parts (merge law)") {
    val keys = keysOf(SparkT.Sf0001)
    val a = keys.filter(col("key") % 2 === 0)
    val b = keys.filter(col("key") % 2 =!= 0)
    def regMap(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Int]("m")).toMap
    val merged = (regMap(Sketches.hllRegisters(a)).toSeq ++
        regMap(Sketches.hllRegisters(b)).toSeq)
      .groupMapReduce(_._1)(_._2)(math.max)
    assert(merged == regMap(Sketches.hllRegisters(keys)))
    assert(merged.nonEmpty && merged.values.forall(m => m >= 1 && m <= Sketches.HllMaxRho))
  }

  test("quantile sketch: estimate within one bin width of exact, rerun-stable") {
    val rows = Sketches.quantileSketch(spark, SparkT.Sf0001).collect()
    assert(rows.map(_.getAs[Int]("pct")).toSeq == Sketches.QuantilePcts)
    // bin width upper bound in currency units: ceil(span / bins) cents
    val Array(lo, hi) = Tables.load(spark, SparkT.Sf0001, "lineitem")
      .selectExpr("CAST(min(floor(l_extendedprice * 100 + 0.5)) AS LONG)",
        "CAST(max(floor(l_extendedprice * 100 + 0.5)) AS LONG)")
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val binWidth = ((hi - lo + 1).toDouble / Sketches.QuantileBins + 1) / 100.0
    rows.foreach { r =>
      assert(r.getAs[Double]("abs_err") <= binWidth,
        s"pct ${r.getAs[Int]("pct")}: err ${r.getAs[Double]("abs_err")} > $binWidth")
      assert(r.getAs[Long]("target_rank") <= r.getAs[Long]("n_rows"))
    }
    val again = Sketches.quantileSketch(spark, SparkT.Sf0001).collect()
    assert(again.map(_.toString).toSeq === rows.map(_.toString).toSeq)
  }

  test("bloom pre-filter never drops a true match and never shuffles the fact") {
    val orders = Tables.load(spark, SparkT.Sf0001, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val dim = Tables.load(spark, SparkT.Sf0001, "customer")
      .filter(col("c_nationkey") === 3).select(col("c_custkey").as("key"))
    val bits = Sketches.bloomBits(dim)
    val candidates = Sketches.bloomFilter(orders, "o_custkey", bits)
    // no false negatives: every truly-joining order survives the filter
    val lost = orders.join(dim, col("o_custkey") === col("key"), "left_semi")
      .exceptAll(candidates.join(dim, col("o_custkey") === col("key"), "left_semi"))
    assert(lost.count() == 0)
    // the pre-filter is broadcast-only on the FACT side: in the plan
    // text everything above the orders scan is the fact path — no
    // exchange may appear there (the tiny bits-build subtree below the
    // scan line legitimately shuffles its distinct)
    candidates.collect()
    val plan = candidates.queryExecution.executedPlan.toString
    val factPath = plan.split("FileScan parquet \\[o_orderkey").head
    assert(factPath.contains("BroadcastHashJoin"),
      s"expected broadcast semi joins on the fact path:\n$plan")
    assert(!factPath.contains("Exchange hashpartitioning"),
      s"bloom filter shuffled the fact side:\n$plan")
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
