package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Ingest

/** Page-chain reassembly integrity (S8 engine half): the flags must
  * catch every way a paged fetch silently loses data — a missing page,
  * a double-landed page, pages disagreeing on total_pages, and an item
  * count short of the advertised total.
  */
case class ApiIt(order_id: Long, state: String, total_price: Double)
case class ApiPage(page_number: Int, total_pages: Int,
    total_count: Int, data: Seq[ApiIt])

class ApiPagesSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def flagsOf(pages: Seq[ApiPage]): (Boolean, Boolean) = {
    import spark.implicits._
    val r = Ingest.assembleApiPages(pages.toDF()).select("chain_ok", "count_ok")
      .distinct().collect()
    assert(r.length == 1, "flags must be constant across rows")
    (r.head.getBoolean(0), r.head.getBoolean(1))
  }

  private def page(n: Int, tp: Int = 3, tc: Int = 3, ids: Seq[Long] = Nil): ApiPage =
    ApiPage(n, tp, tc, ids.map(ApiIt(_, "OK", 1.0)))

  test("complete chain with matching counts is clean") {
    assert(flagsOf(Seq(
      page(0, ids = Seq(1)), page(1, ids = Seq(2)), page(2, ids = Seq(3)))) ==
      ((true, true)))
  }

  test("a missing page trips chain_ok") {
    assert(flagsOf(Seq(page(0, ids = Seq(1)), page(2, ids = Seq(3, 4))))._1 == false)
  }

  test("a double-landed page trips chain_ok") {
    assert(flagsOf(Seq(
      page(0, ids = Seq(1)), page(1, ids = Seq(2)), page(1, ids = Seq(2)),
      page(2, ids = Seq(3))))._1 == false)
  }

  test("pages disagreeing on total_pages trip chain_ok") {
    assert(flagsOf(Seq(
      page(0, ids = Seq(1)), page(1, ids = Seq(2)),
      page(2, tp = 4, ids = Seq(3))))._1 == false)
  }

  test("an item count short of the advertised total trips count_ok only") {
    val (chain, cnt) = flagsOf(Seq(
      page(0, tc = 4, ids = Seq(1)), page(1, tc = 4, ids = Seq(2)),
      page(2, tc = 4, ids = Seq(3))))
    assert(chain && !cnt)
  }
}
