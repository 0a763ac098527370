package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Out
import graft.functions.F
import graft.sources.Ingest

/** End-to-end ingestion pipelines over the committed raw CSV fixtures
  * (`fixtures/raw_orders.csv`, `fixtures/raw_catalog.csv`): the
  * reference's ETL entry path re-expressed as one lazy Spark plan per
  * source (reference etl_sales.py:36-79, enhanced_catalog_parser.py:
  * 151-258).
  *
  * Each pipeline: semicolon-CSV all-string scan → header normalization
  * → rename-map with duplicate-target fallback → typed cleaning
  * (comma decimals, currency junk, day-first dates, `errors='coerce'`
  * nulls) → row validation (invalid-key drop + warning flag columns,
  * F3/F8) → canonical projection.
  */
object Ingestion {

  /** Fixture landing directory (committed, deterministic, own-authored). */
  val FixturesDir = "/root/repo/fixtures"

  /** Orders ingestion (S4/P1/P2/X6..X8/F3): Russian-header order export
    * → canonical typed orders. Rows whose order id fails to parse are
    * dropped (validation); recoverable field problems surface as
    * `date_ok` / `price_ok` warning flags, not row drops.
    */
  def ordersFromRaw(spark: SparkSession, dir: String): DataFrame = {
    val raw = Ingest.normalizeHeaders(
      Ingest.readSemicolonCsv(spark, s"$FixturesDir/raw_orders.csv"))
    val named = Ingest.renameWithFallback(raw, Seq(
      "order_id_raw" -> Seq("№_заказа"),
      "order_date_raw" -> Seq("дата_заказа"),
      "status_raw" -> Seq("статус"),
      "sku_name_raw" -> Seq("наименование_товара"),
      // duplicate-target fallback: primary qty column, else the
      // supplier's "total" column (etl_purchases.py:32-43 pattern)
      "qty_raw" -> Seq("количество", "кол-во_итого"),
      "gross_raw" -> Seq("сумма"),
      "weight_raw" -> Seq("вес_кг")))
    val d = F.dayFirstDate(col("order_date_raw"))
    val price = F.cleanPrice(col("gross_raw"))
    val r = named
      .select(
        col("order_id_raw").try_cast("long").as("order_id"),
        date_format(d, "yyyy-MM-dd").as("order_date"),
        d.isNotNull.as("date_ok"),
        trim(col("status_raw")).as("status"),
        F.normKey(col("sku_name_raw")).as("sku_key"),
        F.cleanStock(col("qty_raw")).as("qty"),
        price.as("gross_price_kzt"),
        price.isNotNull.as("price_ok"),
        (F.cleanWeight(col("weight_raw")) * 1000).as("weight_g"))
      .filter(col("order_id").isNotNull)
    Out.sorted(r)(col("order_id"))
  }

  /** Catalog ingestion (S4/P1/X4..X6/F3/F8): dirty SKU catalog →
    * canonical typed catalog. Rows with an empty SKU id are dropped;
    * unparseable weight/price become nulls counted in `n_warnings`
    * (enhanced_catalog_parser.py:182-220 warning side-outputs).
    */
  def catalogFromRaw(spark: SparkSession, dir: String): DataFrame = {
    val raw = Ingest.normalizeHeaders(
      Ingest.readSemicolonCsv(spark, s"$FixturesDir/raw_catalog.csv"))
    val named = Ingest.renameWithFallback(raw, Seq(
      "sku_id" -> Seq("sku_id"),
      "store" -> Seq("store_name"),
      "brand_raw" -> Seq("brand"),
      "weight_raw" -> Seq("weight_kg"),
      "price_raw" -> Seq("initial_ksp_price"),
      "stock_raw" -> Seq("stock_entered")))
    val weight = F.cleanWeight(col("weight_raw"))
    val price = F.cleanPrice(col("price_raw"))
    val r = named
      .filter(col("sku_id").isNotNull)
      .select(
        col("sku_id"), col("store"),
        coalesce(col("brand_raw"), lit("")).as("brand"),
        weight.as("weight_kg"),
        price.as("price_kzt"),
        F.cleanStock(col("stock_raw")).as("stock"),
        (when(weight.isNull, 1).otherwise(0) +
          when(price.isNull, 1).otherwise(0)).as("n_warnings"))
    Out.sorted(r)(col("sku_id"))
  }
}
