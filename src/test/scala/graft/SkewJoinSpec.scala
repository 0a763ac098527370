package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.F
import graft.operators.Relational

/** The two skew remedies for a hot-key fact-fact join, pinned:
  *   - SALTING (Relational.saltedOrderRevenue): deterministic rewrite —
  *     must be multiset-identical to the plain join AND keep the
  *     demonstrated shuffle-join shape (broadcasting would dodge the
  *     skew instead of spreading it);
  *   - AQE runtime skew-split: the zero-rewrite remedy — must actually
  *     engage on a synthetic hot key, asserted from the adaptive plan.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("salted order-revenue equals the plain join, spread over a shuffle join") {
    val salted = Relational.saltedOrderRevenue(spark, SparkT.Sf0001)
    val l = Tables.load(spark, SparkT.Sf0001, "lineitem")
    val o = Tables.load(spark, SparkT.Sf0001, "orders")
    val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(F.dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("sum_revenue"))
      .orderBy("o_orderstatus")
    assert(salted.collect().toSeq === plain.collect().toSeq)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"salting must demonstrate the shuffle-join shape, not broadcast:\n$plan")
  }

  test("AQE splits the skewed partition of a hot-key shuffle join") {
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      // Shrink the skew thresholds so the local test's hot partition
      // qualifies (production defaults are 256 MB / factor 5).
      spark.conf.set(keys(0), "65536")
      spark.conf.set(keys(1), "2")
      spark.conf.set(keys(2), "32768")
      spark.conf.set(keys(3), "-1") // force a shuffle join
      // 55k of 60k probe rows share key 0; incompressible-ish payload
      // so the hot reducer partition crosses the byte threshold.
      val probe = spark.range(60000).select(
        when(col("id") < 55000, 0L).otherwise(pmod(col("id"), lit(64L))).as("k"),
        sha2(col("id").cast("string"), 512).as("payload"))
      val build = spark.range(64).select(col("id").as("k"), col("id").as("v"))
      val joined = probe.join(build, "k")
      // collect THIS frame (not a derived count) so its own adaptive
      // plan finalizes and carries the skew-split markers
      assert(joined.collect().length === 60000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew"),
        s"AQE skew handling did not engage on the hot key:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
