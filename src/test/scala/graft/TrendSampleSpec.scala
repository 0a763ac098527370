package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, Relational}

/** Laws for grouped OLS and the A-ES weighted sample. */
class TrendSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("price trend: recovers an exactly-linear planted series") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("trend").toString
    // sku 1: p = 100 + 2.5 * day (exact line); sku 2: constant (flat);
    // sku 3: single observation (degenerate — null slope)
    val rows =
      (0 until 10).map(i => (1L, java.sql.Date.valueOf(f"1995-01-${i + 1}%02d"), 100.0 + 2.5 * i)) ++
      (0 until 5).map(i => (2L, java.sql.Date.valueOf(f"1995-02-${i + 1}%02d"), 42.0)) ++
      Seq((3L, java.sql.Date.valueOf("1995-03-01"), 7.0))
    rows.toDF("l_partkey", "l_shipdate", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val r = Relational.priceTrend(spark, tmp).collect()
      .map(x => x.getAs[Long]("sku") -> x).toMap
    assert(r(1L).getAs[Double]("slope") === 2.5)
    // x for sku 1 runs 0..9 (days since 1995-01-01): intercept = 100
    assert(r(1L).getAs[Double]("intercept") === 100.0)
    assert(r(1L).getAs[String]("trend") === "up")
    assert(r(2L).getAs[Double]("slope") === 0.0)
    assert(r(2L).getAs[String]("trend") === "flat")
    assert(r(3L).isNullAt(r(3L).fieldIndex("slope")))
    assert(r(3L).isNullAt(r(3L).fieldIndex("trend")))
  }

  test("boxplot: quartiles match a brute-force recompute, fences bound outliers") {
    val rows = Relational.priceBoxplot(spark, SparkT.Sf0001).collect()
    assert(rows.nonEmpty)
    val cents = Tables.load(spark, SparkT.Sf0001, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted).toMap
    rows.foreach { r =>
      val flag = r.getAs[String]("flag")
      val xs = cents(flag)
      def exactQ(p: Int): Double = {
        val t = (xs.length.toLong * p + 99) / 100 // ceil rank
        xs((t - 1).toInt) / 100.0
      }
      assert(r.getAs[Long]("n_rows") === xs.length.toLong)
      assert(r.getAs[Double]("q25") === exactQ(25))
      assert(r.getAs[Double]("median") === exactQ(50))
      assert(r.getAs[Double]("q75") === exactQ(75))
      assert(r.getAs[Double]("q25") <= r.getAs[Double]("median"))
      assert(r.getAs[Double]("median") <= r.getAs[Double]("q75"))
      // outlier recount against the same fences
      val iqrc = ((r.getAs[Double]("q75") - r.getAs[Double]("q25")) * 100).round
      val q25c = (r.getAs[Double]("q25") * 100).round
      val q75c = (r.getAs[Double]("q75") * 100).round
      val lof = q25c - (3 * iqrc) / 2
      val hif = q75c + (3 * iqrc) / 2
      assert(r.getAs[Long]("n_low_outliers") === xs.count(_ < lof).toLong)
      assert(r.getAs[Long]("n_high_outliers") === xs.count(_ > hif).toLong)
    }
  }

  test("weighted sample: top-k plan, no global sort; heavier docs sampled more") {
    val df = CorpusOps.weightedSample(spark, SparkT.Sf0001)
    val rows = df.collect()
    assert(rows.length === CorpusOps.WeightedSampleK)
    // the limit must compile to a top-k (TakeOrderedAndProject), not a
    // full Sort + Limit of the corpus
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator:\n$plan")
    // ranks contiguous, keys non-increasing
    val keys = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("es_key"))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
    // weighting law: the sample's mean weight exceeds the corpus mean
    // (weight-proportional inclusion; fixture weights vary enough)
    val sampleMean = rows.map(_.getAs[Long]("weight")).sum.toDouble / rows.length
    val corpusMean = Tables.load(spark, SparkT.Sf0001, "documents")
      .agg(avg(col("n_chars"))).collect().head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean should exceed corpus mean $corpusMean")
  }
}
