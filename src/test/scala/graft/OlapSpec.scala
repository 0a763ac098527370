package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** OLAP-surface operators: ROLLUP subtotal consistency and date-spine
  * gap-fill (LOCF) laws — the invariants the oracle hash can't state.
  */
class OlapSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("rollup: subtotal levels are internally consistent") {
    val rows = Relational.salesRollup(spark, SparkT.Sf0001).collect()
    val detail = rows.filter(_.getAs[Long]("gid") == 0L)
    val byFlag = rows.filter(_.getAs[Long]("gid") == 1L)
    val grand = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n_rows") ===
      detail.map(_.getAs[Long]("n_rows")).sum)
    byFlag.foreach { s =>
      val flag = s.getAs[String]("l_returnflag")
      val mine = detail.filter(_.getAs[String]("l_returnflag") == flag)
      assert(s.getAs[Long]("n_rows") === mine.map(_.getAs[Long]("n_rows")).sum)
      // decimal-exact sums: subtotal equals the sum of its details
      assert(math.abs(s.getAs[Double]("sum_qty") -
        mine.map(_.getAs[Double]("sum_qty")).sum) < 1e-6)
    }
    // subtotal rows null out exactly the rolled-up column
    byFlag.foreach(s => assert(s.getAs[String]("l_linestatus") == null))
    assert(grand.head.getAs[String]("l_returnflag") == null)
  }

  test("scd2 history: contiguous versions, chained intervals, one current, real changes") {
    val rows = Relational.priceHistoryScd2(spark, SparkT.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("sku")).foreach { case (sku, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("version"))
      assert(ordered.map(_.getAs[Long]("version")).toSeq ===
        (1L to ordered.length.toLong), s"sku $sku versions not contiguous")
      // intervals chain: each valid_to is the next version's valid_from
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("valid_to") === b.getAs[String]("valid_from"))
          assert(a.getAs[Double]("price") !== b.getAs[Double]("price"),
            s"sku $sku adjacent versions must differ")
          assert(!a.getAs[Boolean]("is_current"))
        case _ =>
      }
      val current = ordered.last
      assert(current.getAs[Boolean]("is_current"))
      assert(current.getAs[String]("valid_to") == null)
    }
  }

  test("scd2: a revisited price opens a NEW version — history, not dedup") {
    import spark.implicits._
    val d = (s: String) => java.sql.Date.valueOf(s)
    val obs = Seq(
      (7L, d("1995-01-01"), 10.0), (7L, d("1995-01-02"), 10.0),
      (7L, d("1995-01-03"), 20.0),
      (7L, d("1995-01-04"), 10.0))
      .toDF("sku", "day", "price")
    val rows = Relational.priceHistoryScd2From(obs).collect()
      .sortBy(_.getAs[Long]("version"))
    assert(rows.map(_.getAs[Double]("price")).toSeq === Seq(10.0, 20.0, 10.0))
    assert(rows.map(_.getAs[Long]("n_days")).toSeq === Seq(2L, 1L, 1L))
    assert(rows.map(_.getAs[String]("valid_from")).toSeq ===
      Seq("1995-01-01", "1995-01-03", "1995-01-04"))
    assert(rows.map(_.getAs[String]("valid_to")).toSeq ===
      Seq("1995-01-03", "1995-01-04", null))
    assert(rows.map(_.getAs[Boolean]("is_current")).toSeq ===
      Seq(false, false, true))
  }

  test("olap plans: rollup is one expand+partial pass; gap-fill spine broadcasts") {
    spark.conf.set("graft.sort.results", "false")
    try {
      val rdf = Relational.salesRollup(spark, SparkT.Sf0001)
      rdf.collect()
      val rp = rdf.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // grouping sets expand BEFORE one map-side-combinable aggregate —
      // one shuffle for all subtotal levels, never one job per level
      assert(rp.contains("Expand"), s"no grouping-set expand:\n$rp")
      assert(rp.contains("partial_"), s"no map-side combine:\n$rp")
      assert(!rp.contains("Join"), s"rollup must not join:\n$rp")
      val gdf = Relational.dailyPriceFill(spark, SparkT.Sf0001)
      gdf.collect()
      val gp = gdf.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // the 365-row calendar spine must broadcast to the key side
      assert(gp.contains("BroadcastNestedLoopJoin"),
        s"spine must broadcast:\n$gp")
      assert(!gp.contains("CartesianProduct"), s"cartesian on data:\n$gp")
    } finally spark.conf.set("graft.sort.results", "true")
  }

  test("gap fill: dense spine, LOCF law, observed flags match raw minima") {
    val rows = Relational.dailyPriceFill(spark, SparkT.Sf0001).collect()
    val bySku = rows.groupBy(_.getAs[Long]("sku"))
    bySku.foreach { case (_, rs) =>
      assert(rs.length === 365, "every sku covers the whole spine")
      val ordered = rs.sortBy(_.getAs[String]("day"))
      var lastSeen: Option[Double] = None
      ordered.foreach { r =>
        if (r.getAs[Boolean]("is_observed"))
          lastSeen = Some(r.getAs[Double]("price"))
        // filled value is the running last observation (null before any)
        (lastSeen, Option(r.getAs[Any]("price"))) match {
          case (Some(want), Some(got)) => assert(got === want)
          case (None, got) => assert(got.isEmpty, "price before first observation")
          case (Some(_), None) => fail("null after an observation")
        }
      }
      assert(lastSeen.isDefined, "a sku with zero observations cannot be on the grid")
    }
  }
}
