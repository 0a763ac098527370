package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, Relational}

/** Laws the oracle hash can't state for the round-7 additions: the
  * binned interval join's equi-join plan shape and boundary semantics,
  * pivot/unpivot duality, cube cardinality, and DSIR's separation of a
  * planted target-like document from a raw-like one.
  */
class RangeJoinDsirSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("range join binned: equi-join plan, never a nested-loop θ-join") {
    val df = Relational.rangeJoinBinned(spark, SparkT.Sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"θ-join leaked into the binned plan:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cross product leaked into the binned plan:\n$plan")
  }

  test("range join binned: equals the θ-join on the same data, boundaries exact") {
    import spark.implicits._
    val w = Relational.RangeJoinWindowUs
    val e = Tables.load(spark, SparkT.Sf0001, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t"), col("value"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), unix_micros(col("ts")).as("s"))
    // reference: per-purchase count via the naive θ-join
    val theta = p.join(c,
        col("user_id") === col("cu") &&
          col("s") < col("t") && col("s") >= col("t") - w, "left")
      .groupBy("event_id").agg(count(col("s")).as("n"))
      .as[(Long, Long)].collect().toMap
    val binned = Relational.rangeJoinBinned(spark, SparkT.Sf0001)
      .select("event_id", "n_prior_clicks").as[(Long, Long)].collect().toMap
    assert(binned === theta)
    assert(binned.nonEmpty && binned.valuesIterator.sum > 0L,
      "fixture window produced no matches — boundary semantics untested")
  }

  test("cube: 4 grouping levels, grand total consistent") {
    val rows = Relational.salesCube(spark, SparkT.Sf0001).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet === Set(0L, 1L, 2L, 3L))
    val detailN = byGid(0L).map(_.getAs[Long]("n_orders")).sum
    assert(byGid(3L).map(_.getAs[Long]("n_orders")).sum === detailN)
    assert(byGid(1L).map(_.getAs[Long]("n_orders")).sum === detailN)
    assert(byGid(2L).map(_.getAs[Long]("n_orders")).sum === detailN)
    // cube cardinality: |a|*|b| present combos + |a| + |b| + 1
    val na = byGid(1L).length
    val nb = byGid(2L).length
    assert(byGid(3L).length === 1)
    assert(byGid(0L).length <= na * nb)
  }

  test("pivot/unpivot duality: melt restores every (day, type) cell incl. zeros") {
    val wide = Relational.eventPivot(spark, SparkT.Sf0001).collect()
    val long = Relational.eventUnpivot(spark, SparkT.Sf0001).collect()
    assert(long.length === wide.length * Relational.EventTypes.length)
    val longMap = long.map(r => (r.getAs[String]("day"),
      r.getAs[String]("event_type")) -> r.getAs[Long]("n_events")).toMap
    wide.foreach { r =>
      Relational.EventTypes.foreach { t =>
        assert(longMap((r.getAs[String]("day"), t)) === r.getAs[Long](s"n_$t"))
      }
    }
  }

  test("dsir: separates a planted target-like doc from a raw-like one") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dsir").toString
    // target domain (src1) speaks one vocabulary; raw pool (srcX) another;
    // probe docs written in each vocabulary with NON-target sources
    val target = (1 to 40).map(i =>
      (i.toLong, "alpha beta gamma delta " * 10, "en", "src1", 40L))
    val rawPool = (41 to 80).map(i =>
      (i.toLong, "omega psi chi phi " * 10, "en", "src9", 40L))
    val probes = Seq(
      (81L, "alpha beta gamma delta alpha beta", "en", "src9", 6L),
      (82L, "omega psi chi phi omega psi", "en", "src9", 6L))
    (target ++ rawPool ++ probes)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = CorpusOps.dsirWeights(spark, tmp).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Double]("dsir_weight"), x.getAs[Boolean]("more_target_like")))
      .toMap
    assert(r(81L)._1 > r(82L)._1,
      s"target-vocabulary probe must outscore raw-vocabulary probe: $r")
    assert(r(81L)._2 && !r(82L)._2)
    // weights are per-bigram sums: a target doc itself scores positive
    assert(r(1L)._2)
  }
}
