package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Parsing, Relational}

/** Golden-fixture parser tests — the engine's port of the reference's
  * two vitest cases (test/parseSellers.test.ts:1-21 asserts a seller
  * name + integer price + delivery from golden HTML;
  * test/analytics.test.ts:1-19 asserts global analytics fields over a
  * small result).
  */
class ParsingSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("parseSellers extracts name / numeric price / delivery (parseSellers.test.ts port)") {
    val rows = Parsing.parseSellers(spark, SparkT.Sf0001).collect()
    assert(rows.length === 5) // 6 seller rows, one dropped by price > 0
    val first = rows.head
    assert(first.getAs[String]("seller") === "Магазин Один")
    assert(first.getAs[Long]("price") === 12990L)
    assert(first.getAs[String]("delivery_date") === "2025-09-12")
    // the empty-delivery row parses with a null date, not a crash
    val third = rows.find(_.getAs[String]("seller") === "ТОО Три").get
    assert(third.getAs[Long]("price") === 13500L)
    assert(third.getAs[String]("delivery_date") == null)
    // F7's drop keys on the EXACT pair (name == 'Out of stock' AND
    // price == 0, app/page.tsx:151-161): the zero-price placeholder is
    // filtered, while a real seller that happens to CARRY that name but
    // quotes a positive price survives — name-based filtering would be
    // the wrong rule
    val oos = rows.filter(_.getAs[String]("seller") == "Out of stock")
    assert(oos.length === 1 && oos.head.getAs[Long]("price") === 7500L)
  }

  test("extractConfig pulls the balanced payload + typed probes") {
    val r = Parsing.extractConfig(spark, SparkT.Sf0001).head()
    assert(r.getAs[String]("title") === "Кроссовки Alpha")
    assert(r.getAs[String]("brand") === "Alpha")
    assert(r.getAs[Long]("n_variants") === 2L)
    assert(r.getAs[String]("first_code") === "V-1")
    assert(r.getAs[Int]("first_size_num") === 42)
    assert(r.getAs[String]("color") === "Синий")
  }

  test("globalAnalytics exposes spread stats over variants (analytics.test.ts port)") {
    val r = Relational.globalAnalytics(spark, SparkT.Sf0001).head()
    assert(r.getAs[Long]("n_skus") > 0)
    assert(!r.isNullAt(r.fieldIndex("max_spread")))
    assert(r.getAs[Double]("max_spread") >= r.getAs[Double]("median_spread"))
  }

  test("uniqueSuppliersPerBrand counts distinct sellers (analytics.test.ts port)") {
    val rows = Relational.uniqueSuppliersPerBrand(spark, SparkT.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_suppliers") > 0)
      assert(r.getAs[Long]("n_suppliers") <= r.getAs[Long]("n_lines"))
    }
  }
}
