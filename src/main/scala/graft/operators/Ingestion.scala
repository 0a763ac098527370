package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Out
import graft.functions.F
import graft.sources.{Excel, Ingest}

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

  /** Stock ingestion through the TYPED reader (S5, reference
    * etl_stock.py:16): explicit DDL schema — no inference pass, which
    * at scale is a full extra scan — with DROPMALFORMED row validation:
    * a row whose sku/qty/price fails to parse under the declared types
    * is dropped whole (the reference drops unparseable stock lines the
    * same way). The committed fixture plants one junk id and two
    * unparseable numerics among clean rows so the drop rule itself is
    * inside the hash.
    */
  def stockFromTyped(spark: SparkSession, dir: String): DataFrame =
    Out.sorted(
      Ingest.readTypedCsv(spark, s"$FixturesDir/raw_stock.csv",
        "sku BIGINT, qty INT, price DOUBLE"))(col("sku"))

  /** Excel orders ingestion (S1/S2/S6/P1/P2/X8): glob every
    * `*rders*.xlsx` workbook, union, normalize Russian headers, type.
    * Mirrors reference etl_sales.py:36-62 (read_excel → header
    * normalize → rename → prune → day-first dates → constants) with the
    * junk-row drop on the unparseable order id.
    */
  def ordersFromExcel(spark: SparkSession, dir: String): DataFrame = {
    val raw = Ingest.normalizeHeaders(
      Excel.readXlsx(spark, s"$FixturesDir/xlsx/*rders*.xlsx"))
    val named = Ingest.renameWithFallback(raw, Seq(
      "order_id_raw" -> Seq("№_заказа"),
      "order_date_raw" -> Seq("дата_поступления_заказа"),
      "sku_name_raw" -> Seq("название_товара_в_kaspi_магазине"),
      "gross_raw" -> Seq("сумма"),
      "status_date_raw" -> Seq("дата_изменения_статуса"),
      "status_raw" -> Seq("статус"),
      "qty_raw" -> Seq("количество")))
    val d = F.dayFirstDate(col("order_date_raw"))
    val sd = F.dayFirstDate(col("status_date_raw"))
    val r = named
      .select(
        col("order_id_raw").try_cast("long").as("order_id"),
        date_format(d, "yyyy-MM-dd").as("order_date"),
        date_format(sd, "yyyy-MM-dd").as("status_date"),
        trim(col("status_raw")).as("status"),
        trim(col("sku_name_raw")).as("sku_name_raw"),
        F.cleanStock(col("qty_raw")).as("qty"),
        floor(F.cleanPrice(col("gross_raw"))).as("gross_price_kzt"),
        lit(0.12).as("kaspi_fee_pct"))
      .filter(col("order_id").isNotNull)
    Out.sorted(r)(col("order_id"))
  }

  /** S8 — landed paged-API orders, reassembled with chain-integrity
    * flags (see [[Ingest.assembleApiPages]]).
    */
  def ordersFromApiPages(spark: SparkSession, dir: String): DataFrame = {
    val r = Ingest.assembleApiPages(
      Ingest.readApiPages(spark, s"$FixturesDir/api_pages/*.json"))
    Out.sorted(r)(col("order_id"))
  }

  /** Excel purchases ingestion (S6/P2/F13/D1): supplier purchase
    * workbook → canonical purchases. Exercises every non-string cell
    * kind (date-styled serials, formula-cached values, booleans, error
    * cells) and the reference's first-wins dedup on (po_id, sku_key)
    * (etl_purchases.py:28-56) — "first" made deterministic by the
    * reader's (_file, _row) provenance instead of pandas row order.
    */
  def purchasesFromExcel(spark: SparkSession, dir: String): DataFrame = {
    val raw = Ingest.normalizeHeaders(
      Excel.readXlsx(spark, s"$FixturesDir/xlsx/Purchase inquiry*.xlsx"))
    val named = Ingest.renameWithFallback(raw, Seq(
      "po_id" -> Seq("po_id"),
      "sku_key" -> Seq("sku_key"),
      "order_date_raw" -> Seq("po_date"),
      "arrival_raw" -> Seq("ast_arrival_date"),
      // duplicate-target fallback (etl_purchases.py:37-38)
      "qty_raw" -> Seq("qty", "total_model_order_qty"),
      "unit_raw" -> Seq("unit_cogs_kzt"),
      "freight_raw" -> Seq("total_model_deliverycost_kzt"),
      "total_raw" -> Seq("total_model_freightcost_kzt"),
      "paid_raw" -> Seq("paid"),
      "_file" -> Seq("_file"),
      "_row" -> Seq("_row")))
    val w = Window.partitionBy(col("po_id"), col("sku_key"))
      .orderBy(col("_file"), col("_row"))
    val r = named
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("po_id"), col("sku_key"),
        // reader emits ISO for date-styled cells; dayFirstDate's ISO
        // fallback re-parses + coerces garbage to null (errors='coerce')
        date_format(F.dayFirstDate(col("order_date_raw")), "yyyy-MM-dd").as("order_date"),
        date_format(F.dayFirstDate(col("arrival_raw")), "yyyy-MM-dd").as("arrival_date"),
        col("qty_raw").try_cast("int").as("qty"),
        col("unit_raw").try_cast("double").as("unit_cogs_kzt"),
        col("freight_raw").try_cast("double").as("freight_kzt"),
        col("total_raw").try_cast("double").as("total_cogs_kzt"),
        col("paid_raw").try_cast("boolean").as("paid"))
    Out.sorted(r)(col("po_id"), col("sku_key"))
  }
}
