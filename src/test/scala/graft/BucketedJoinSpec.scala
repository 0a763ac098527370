package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-shuffled tables co-locate their join — the shuffle
  * happens once at WRITE time and every subsequent join on the bucket
  * key reads both sides exchange-free. At 100 TB this is the difference
  * between re-shuffling the fact table per query and never shuffling it
  * again; the spec pins the exchange-free plan, not just the result.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("join on the bucket key runs without any exchange") {
    graft.sources.Sinks.writeBucketed(
      Tables.load(spark, SparkT.Sf0001, "lineitem"), "li_bucketed", "l_orderkey", 4)
    graft.sources.Sinks.writeBucketed(
      Tables.load(spark, SparkT.Sf0001, "orders"), "ord_bucketed", "o_orderkey", 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val n = joined.collect().map(_.getLong(1)).sum
      assert(n === Tables.load(spark, SparkT.Sf0001, "lineitem").count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      // the later groupBy on o_orderpriority legitimately shuffles; the
      // JOIN KEYS must not — both sides read pre-bucketed
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles its keys:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("the q_bucketed_join builder's executed plan is the exchange-free SMJ") {
    val df = graft.sources.Sinks.bucketedJoinRoundtrip(spark, SparkT.Sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles its keys:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
  }
}
