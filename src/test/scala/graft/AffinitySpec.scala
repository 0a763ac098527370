package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Affinity

/** Laws for the item-affinity operators that the oracle hash can't
  * state: PageRank mass conservation and hub dominance on a planted
  * star graph, and a hand-computed lift value.
  */
class AffinitySpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  /** A planted basket corpus: a hub item co-purchased with every spoke
    * (each pair twice, to clear min-support), and spokes never
    * co-purchased with each other. */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("affinity").toString
    val hub = 100L
    val spokes = (101L to 110L)
    val rows = for {
      s <- spokes
      rep <- 0 to 1 // two orders per (hub, spoke) pair
    } yield (s * 10 + rep, hub, s)
    rows.flatMap { case (ok, a, b) => Seq((ok, a), (ok, b)) }
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    tmp
  }

  test("pagerank: mass conserved, hub dominates spokes on a star graph") {
    val rows = Affinity.itemPagerank(spark, plantedDir).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("deg"), r.getAs[Double]("pagerank"))).toMap
    assert(rows.size === 11)
    assert(rows(100L)._1 === 10L) // hub degree
    val (hubPr, spokePrs) =
      (rows(100L)._2, rows.filterKeys(_ != 100L).values.map(_._2))
    spokePrs.foreach(s => assert(hubPr > 2 * s,
      s"hub must dominate: hub=$hubPr spoke=$s"))
    // all mass accounted for (damping conserves it on a dangling-free
    // graph; tolerance covers the per-edge 1e-10 roundings)
    val total = hubPr + spokePrs.sum
    assert(math.abs(total - 1.0) < 1e-5, s"rank mass drifted: $total")
    // spokes are symmetric: identical rank
    assert(spokePrs.toSet.size === 1)
  }

  test("lift: hand-computed value on the planted corpus") {
    val rows = Affinity.basketLift(spark, plantedDir).collect()
    // only (hub, spoke) pairs survive min-support
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("part_a") === 100L)
      assert(r.getAs[Long]("n_pair") === 2L)
      // N=20 orders, hub in all 20, spoke in its 2:
      // lift = 2*20/(20*2) = 1.0 — hub co-occurs with everything, so
      // no attraction beyond chance
      assert(r.getAs[Double]("lift") === 1.0)
    }
  }

  test("pagerank on real data: positive, mass conserved") {
    val rows = Affinity.itemPagerank(spark, SparkT.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("pagerank") > 0.0))
    val total = rows.map(_.getAs[Double]("pagerank")).sum
    assert(math.abs(total - 1.0) < 1e-4, s"rank mass drifted: $total")
  }
}
