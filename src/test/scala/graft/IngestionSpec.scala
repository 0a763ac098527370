package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ingestion

/** Ingestion pipeline invariants over the committed raw fixtures. */
class IngestionSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("orders: invalid-id row dropped, fallback qty used, coercion flags set") {
    val rows = Ingestion.ordersFromRaw(spark, SparkT.Sf0001).collect()
    assert(rows.length === 42)                       // 43 data rows, 1 bad id
    assert(rows.forall(_.getAs[Long]("order_id") >= 1001L))
    // order 1003 has empty primary qty and "3 шт" in the fallback column
    val o3 = rows.find(_.getAs[Long]("order_id") === 1003L).get
    assert(o3.getAs[Int]("qty") === 3)
    // date warnings exist but don't drop rows
    assert(rows.count(!_.getAs[Boolean]("date_ok")) > 0)
    assert(rows.count(!_.getAs[Boolean]("price_ok")) > 0)
    // sku keys are normalized (trimmed + uppercased)
    assert(rows.forall { r =>
      val k = r.getAs[String]("sku_key"); k == k.trim && k == k.toUpperCase })
  }

  test("typed CSV reader applies the explicit schema without inference (S5)") {
    val df = graft.sources.Ingest.readTypedCsv(spark,
      s"${Ingestion.FixturesDir}/shards/orders_2025_01.csv",
      "id LONG, qty INT, amount STRING", sep = ";")
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq(("id", "long"), ("qty", "integer"), ("amount", "string")))
    assert(df.count() === 3)
  }

  test("catalog: empty SKU dropped, dirty numerics cleaned, warnings counted") {
    val rows = Ingestion.catalogFromRaw(spark, SparkT.Sf0001).collect()
    assert(rows.length === 32)                       // 36 rows, 4 empty SKU_ID
    val bySku = rows.map(r => r.getAs[String]("sku_id") -> r).toMap
    assert(bySku("SKU-100").getAs[Double]("weight_kg") === 0.95)
    assert(bySku("SKU-100").getAs[Long]("price_kzt") === 15000L)
    assert(bySku("SKU-100").getAs[Int]("stock") === 12)
    assert(bySku("SKU-101").getAs[Double]("weight_kg") === 1.2)   // "1.2 кг"
    assert(bySku("SKU-102").isNullAt(
      bySku("SKU-102").fieldIndex("weight_kg")))                  // "N/A"
    assert(bySku("SKU-103").getAs[Int]("n_warnings") === 1)       // bad price
  }
}
