package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusOps, Relational}

/** Laws for the PIT join and contrastive triplet mining. */
class PitTripletSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("pit join: every fact sees exactly the version valid on its day — no leakage") {
    val hist = Relational.priceHistoryScd2(spark, SparkT.Sf0001).collect()
      .groupBy(_.getAs[Long]("sku"))
    val joined = Relational.pitJoin(spark, SparkT.Sf0001).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val sku = r.getAs[Long]("sku")
      val day = r.getAs[String]("ship_day")
      val v = r.getAs[Long]("asof_version")
      val expected = hist(sku).filter { h =>
        val from = h.getAs[String]("valid_from")
        val to = h.getAs[String]("valid_to")
        from <= day && (to == null || day < to) // ISO strings compare as dates
      }
      assert(expected.length === 1, s"sku $sku day $day matches ${expected.length} versions")
      assert(expected.head.getAs[Long]("version") === v)
      assert(expected.head.getAs[Double]("price") === r.getAs[Double]("asof_price"))
    }
  }

  test("triplets: members distinct, one per near-dup pair, deterministic") {
    val t1 = CorpusOps.contrastiveTriplets(spark, SparkT.Sf0001).collect()
    assert(t1.nonEmpty)
    t1.foreach { r =>
      val a = r.getAs[Long]("anchor_id")
      val p = r.getAs[Long]("positive_id")
      val n = r.getAs[Long]("negative_id")
      assert(a != p && n != a && n != p, s"degenerate triplet ($a, $p, $n)")
      assert(r.getAs[Double]("pos_jaccard") > 0.0)
    }
    val t2 = CorpusOps.contrastiveTriplets(spark, SparkT.Sf0001).collect()
    assert(t1.map(_.toSeq).toSeq === t2.map(_.toSeq).toSeq, "non-deterministic")
  }
}
