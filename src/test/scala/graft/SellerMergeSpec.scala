package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SellerMerge
import graft.operators.SellerMerge.{Buf, Obs}

/** The D2 exact-merge policy (scrape.ts:543-563): lowest price,
  * first-seen original-case name, prefer-nonempty delivery — plus the
  * distributed-correctness property that makes it safe at scale:
  * merge() must be associative and agree with any reduce() order.
  */
class SellerMergeSpec extends AnyFunSuite {

  private val a = SellerMerge.agg

  private def run(obs: Seq[Obs]): SellerMerge.Merged =
    a.finish(obs.foldLeft(a.zero)(a.reduce))

  test("keeps lowest price, first-seen name, non-empty delivery") {
    val m = run(Seq(
      Obs(3, "SHOP one", 120.0, ""),
      Obs(1, "Shop One", 150.0, ""),
      Obs(2, "shop ONE", 130.0, "12 сентября")))
    assert(m.best_price === 120.0)
    assert(m.seller_name === "Shop One")     // seq 1 wins, original case
    assert(m.delivery === "12 сентября")     // only non-empty delivery
    assert(m.n_merged === 3)
  }

  test("all-empty deliveries stay empty; single row is identity") {
    val m = run(Seq(Obs(5, "A", 10.0, ""), Obs(6, "a", 9.0, "")))
    assert(m.delivery === "")
    val one = run(Seq(Obs(1, "Solo", 42.0, "завтра")))
    assert(one === SellerMerge.Merged("Solo", 42.0, "завтра", 1))
  }

  test("merge is associative and order-insensitive (partial-agg safety)") {
    val rnd = new scala.util.Random(11)
    (1 to 30).foreach { _ =>
      val obs = Seq.tabulate(1 + rnd.nextInt(12)) { i =>
        Obs(i + 1, s"Name${rnd.nextInt(3)}", rnd.nextInt(100).toDouble,
          if (rnd.nextBoolean()) "" else s"d${rnd.nextInt(5)}")
      }
      val sequential = run(obs)
      // random partition into buffers, merged in random order
      val parts = obs.groupBy(_ => rnd.nextInt(4)).values.toSeq
      val bufs = parts.map(p => p.foldLeft(a.zero)(a.reduce))
      val shuffled = rnd.shuffle(bufs)
      val merged = a.finish(shuffled.foldLeft(a.zero)(a.merge))
      assert(merged === sequential, s"obs=$obs")
    }
  }

  test("built-in min_by query path equals the typed Aggregator policy") {
    val spark = SparkT.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val obs = Seq.tabulate(400) { i =>
      (1L + rnd.nextInt(5), // sku
        i.toLong + 1,       // seq (unique)
        s"${if (rnd.nextBoolean()) "Shop" else "SHOP"} ${rnd.nextInt(4)}",
        (rnd.nextInt(1000) + 1).toDouble,
        if (rnd.nextInt(3) == 0) "" else s"day-${rnd.nextInt(9)}")
    }.toDF("sku", "seq", "name_raw", "price", "delivery")

    val builtin = SellerMerge.mergeBuiltin(obs)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getString(2), r.getDouble(3), r.getString(4), r.getLong(5))).toMap

    val typed = obs.as[(Long, Long, String, Double, String)]
      .map { case (sku, seq, n, p, d) =>
        (sku, n.toLowerCase.trim, Obs(seq, n, p, d))
      }
      .groupByKey { case (sku, key, _) => (sku, key) }
      .mapValues(_._3)
      .agg(a.toColumn)
      .collect().map { case ((sku, key), m) =>
        (sku, key) -> (m.seller_name, m.best_price, m.delivery, m.n_merged)
      }.toMap

    assert(builtin === typed)
  }

  test("reduce into non-empty buffer equals merge of singleton buffers") {
    val o1 = Obs(1, "X", 5.0, "")
    val o2 = Obs(2, "y", 3.0, "del")
    val viaReduce = a.reduce(a.reduce(a.zero, o1), o2)
    val viaMerge = a.merge(a.reduce(a.zero, o1), a.reduce(a.zero, o2))
    assert(a.finish(viaReduce) === a.finish(viaMerge))
  }
}
