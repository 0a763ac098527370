package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Out
import graft.functions.{ExtractBalancedJson, F, Html, JsonMatrixWalk}

/** Fixture-driven HTML/embedded-JSON extraction pipelines (SURVEY.md
  * S10/S12/X9/X11/X13/X15/X17/F5): the engine-side half of the
  * reference's scrape path (server/parse.ts, server/scrape.ts:352-397),
  * run over the committed own-authored golden page
  * `fixtures/product_page.html`.
  */
object Parsing {

  private def page(spark: SparkSession): DataFrame =
    spark.read.option("wholetext", "true")
      .text(s"${Ingestion.FixturesDir}/product_page.html")

  /** S10/X9/X11/F5 — seller rows from page HTML: split to row chunks,
    * extract name/price/delivery, parse the Russian month date, drop
    * non-offers (positive-price filter, parse.ts:19).
    */
  def parseSellers(spark: SparkSession, dir: String): DataFrame = {
    // number chunks BEFORE filtering so row_idx is the position in the
    // raw page, matching the oracle's generate_subscripts numbering
    val chunks = page(spark)
      .select(posexplode(split(col("value"), "<li")).as(Seq("pos", "chunk")))
      .filter(instr(col("chunk"), "seller-row") > 0)
    val r = chunks.select(
        (col("pos") + 1).as("row_idx"),
        trim(Html.spanText(col("chunk"), "name")).as("seller"),
        F.priceTextToLong(Html.spanText(col("chunk"), "price")).as("price"),
        date_format(Html.ruMonthDate(Html.spanText(col("chunk"), "delivery"), 2025),
          "yyyy-MM-dd").as("delivery_date"))
      .filter(col("price") > 0)
    Out.sorted(r)(col("row_idx"))
  }

  /** X16 — variant-matrix walk: parse the extracted configurator into a
    * typed nested schema and flatten every variant to a row
    * (scrape.ts:375-391 walks the matrix collecting code→size; with
    * from_json the walk is explode over the typed array — no UDF).
    */
  def configVariants(spark: SparkSession, dir: String): DataFrame = {
    val cfg = ExtractBalancedJson(spark, col("value"),
      lit("BACKEND.components.configurator ="))
    val schema = "STRUCT<title: STRING, color: STRING, " +
      "variants: ARRAY<STRUCT<code: STRING, size: STRING, " +
      "stock: STRUCT<count: INT>>>, meta: STRUCT<brand: STRING>>"
    val r = page(spark)
      .select(from_json(cfg, schema, Map.empty[String, String]).as("c"))
      .select(posexplode(col("c.variants")).as(Seq("idx", "v")))
      .select(
        (col("idx") + 1).as("variant_idx"),
        col("v.code").as("code"),
        col("v.size").as("size"),
        Html.sizeNumber(col("v.size")).as("size_num"),
        col("v.stock.count").as("stock_count"))
    Out.sorted(r)(col("variant_idx"))
  }

  private def pageMatrix(spark: SparkSession): DataFrame =
    spark.read.option("wholetext", "true")
      .text(s"${Ingestion.FixturesDir}/product_page_matrix.html")

  /** X16 (unbounded) — recursive variant-matrix walk over the deep
    * fixture page: [[JsonMatrixWalk]] DFS-walks the nested
    * `configurator.matrix` tree to ANY depth (scrape.ts:373-391),
    * closing the fixed-depth limitation of [[configVariants]]. The
    * per-product `max_by(size_label, path)` reproduces the reference's
    * last-write-wins `out[pid] = label` object assignment — `path` is
    * zero-padded DFS position, so its lexicographic max IS the last
    * write in document order. One row per product with its match count
    * and deepest match level.
    */
  def matrixWalk(spark: SparkSession, dir: String): DataFrame = {
    val cfg = ExtractBalancedJson(spark, col("value"),
      lit("BACKEND.components.configurator ="))
    val hits = pageMatrix(spark)
      .select(explode(JsonMatrixWalk(spark, cfg)).as("w"))
      .select(col("w.product_code"), col("w.size_label"),
        col("w.depth"), col("w.path"))
    val r = hits.groupBy("product_code").agg(
      max_by(col("size_label"), col("path")).as("size_label"),
      count(lit(1)).as("n_matches"),
      max(col("depth")).as("max_depth"))
    Out.sorted(r)(col("product_code"))
  }

  /** X10 — delivery-text normalization over the committed blurb
    * fixture: multi-line Russian delivery text → the reference's
    * compact `"postamat - <date>, delivery - <date>"` form
    * (scrape.ts:414-432). Pure array/regex expressions
    * ([[Html.normalizeDeliveryText]]); per-row map, no shuffle.
    */
  def deliveryNorm(spark: SparkSession, dir: String): DataFrame = {
    val r = spark.read
      .schema("id LONG, text STRING")
      .json(s"${Ingestion.FixturesDir}/delivery_texts.jsonl")
      .select(col("id"),
        Html.normalizeDeliveryText(col("text"), 2025).as("delivery_norm"))
    Out.sorted(r)(col("id"))
  }

  /** X12 — trailing-id extraction from product hrefs (reference
    * scrape.ts:39-42: the scraper recovers a product id from its page
    * URL's `-<digits>/` tail). The builder synthesizes the three href
    * shapes the scraper meets — slash-terminated `…-id/`, bare `…-id`,
    * and a digits-after-slash path that must NOT match (no dash before
    * the digits) — so both the extraction and the no-match empty-string
    * contract of [[F.idFromHref]] sit inside the hash. Pure per-row
    * regex; no shuffle.
    */
  def hrefIds(spark: SparkSession, dir: String): DataFrame = {
    val href =
      when(pmod(col("p_partkey"), lit(3)) === 0,
        concat(lit("/p/item-"), (col("p_partkey") * 7).cast("string"), lit("/")))
        .when(pmod(col("p_partkey"), lit(3)) === 1,
          concat(lit("/shop/item-"), (col("p_partkey") * 7).cast("string")))
        .otherwise(concat(lit("/p/items/"), col("p_partkey").cast("string")))
    val r = graft.Tables.load(spark, dir, "part")
      .select(col("p_partkey").as("sku"), href.as("href"))
      .withColumn("href_id", F.idFromHref(col("href")))
    Out.sorted(r)(col("sku"))
  }

  /** S14 — source-priority fallback offers (reference scrape.ts:634-645:
    * sellers come from the captured-XHR JSON parse; the DOM parse runs
    * ONLY when the capture yields zero sellers; both paths then
    * normalize + dedupe). Re-expressed declaratively: union every
    * landed source with its priority rank, keep each product's rows
    * from its best non-empty source (min-priority window — one shuffle
    * by product key, no driver branching), then apply the reference's
    * dedupeSellers merge policy (scrape.ts:543-559: key =
    * lower(trim(name)), first-seen casing, lowest positive price,
    * first non-empty delivery).
    *
    * At scale the fallback is data-parallel per product — a cluster
    * processes millions of products' capture attempts in one pass
    * where the reference branches per page load.
    */
  def offersWithFallback(spark: SparkSession, dir: String): DataFrame = {
    val captured = spark.read
      .schema("idx LONG, product_id STRING, seller STRING, price LONG, delivery_date STRING")
      .json(s"${Ingestion.FixturesDir}/offers_captured.jsonl")
      .select(col("product_id"), col("idx"), col("seller"), col("price"),
        col("delivery_date"), lit("captured_json").as("source"),
        lit(1).as("src_priority"))
    // the golden page is the landed DOM capture of product P200
    val dom = parseSellers(spark, dir).select(
      lit("P200").as("product_id"), col("row_idx").cast("long").as("idx"),
      col("seller"), col("price"), col("delivery_date"),
      lit("dom").as("source"), lit(2).as("src_priority"))
    val best = min(col("src_priority")).over(Window.partitionBy("product_id"))
    val kept = captured.unionByName(dom)
      .withColumn("best", best)
      .filter(col("src_priority") === col("best"))
      .withColumn("dd", when(trim(col("delivery_date")) === "", null)
        .otherwise(col("delivery_date")))
    val r = kept
      .groupBy(col("product_id"), lower(trim(col("seller"))).as("seller_key"))
      .agg(
        min_by(trim(col("seller")), col("idx")).as("seller"),
        min(col("source")).as("source"),
        coalesce(min(when(col("price") > 0, col("price"))), lit(0L)).as("price"),
        min_by(col("dd"), when(col("dd").isNotNull, col("idx"))).as("delivery_date"),
        count(lit(1)).as("n_merged"))
    Out.sorted(r)(col("product_id"), col("seller_key"))
  }

  /** EP3 end-to-end composition (SURVEY §3): the full analyze pipeline
    * from the landed capture to the A9 global aggregate, as ONE plan —
    * 5-stage offer fallback + D2 dedupe-merge ([[offersWithFallback]])
    * → positive-price filter (F5) → per-product min/median anchors →
    * X19 bot flags → X20 floor predictions → the A9 second-level
    * aggregate (offer mass, bot share, spread stats, best entry price
    * and best floor). Every stage is individually oracle-pinned by its
    * own row; this row pins their INTEGRATION — the chained-CTE oracle
    * replays the whole lifecycle and must hash-match.
    *
    * Scale shape: one groupBy(product, seller) merge, two window
    * anchors on the product key (reusing the merge partitioning), one
    * product-level aggregate, one scalar aggregate. Nothing all-pairs,
    * no driver-side loop — the reference's sequential per-variant HTTP
    * loop (server/scrape.ts:615-805) becomes a data-parallel plan over
    * however many captured pages landed.
    */
  def analyzePipeline(spark: SparkSession, dir: String): DataFrame = {
    val perProduct = flaggedOffers(spark, dir).groupBy("product_id").agg(
        count(lit(1)).as("n_offers"),
        min(col("price")).as("min_price"),
        max(col("price")).as("max_price"),
        sum(when(col("is_bot"), 1L).otherwise(0L)).as("n_bots"))
      .withColumn("spread", col("max_price") - col("min_price"))
      .withColumn("predicted_min_24h",
        when(col("n_bots") >= 2,
          greatest(lit(0.0), col("min_price").cast("double") - 200.0))
          .otherwise(col("min_price").cast("double")))
    globalAgg(perProduct)
  }

  /** Merged offers with per-product anchors and the X19 bot flag — the
    * shared front half of [[analyzePipeline]] and the typed
    * [[analyzeResults]] assembly.
    */
  private def flaggedOffers(spark: SparkSession, dir: String): DataFrame = {
    val offers = offersWithFallback(spark, dir).filter(col("price") > 0)
    val w = Window.partitionBy(col("product_id"))
    offers
      .withColumn("mn", min(col("price")).over(w))
      .withColumn("md", median(col("price")).over(w))
      .withColumn("is_bot",
        F.isPriceBot(col("price").cast("double"), col("mn").cast("double"),
          col("md"), nearAbs = 100.0, nearPct = 0.0025, tight = 3000.0))
  }

  /** The A9 second-level aggregate over any per-product stats frame
    * (n_offers, min_price, max_price, n_bots, spread,
    * predicted_min_24h) — shared tail of both pipeline forms.
    */
  private def globalAgg(perProduct: DataFrame): DataFrame =
    perProduct.agg(
      count(lit(1)).as("n_products"),
      sum(col("n_offers")).as("n_offers"),
      sum(col("n_bots")).as("n_bots"),
      F.roundHalfUp(sum(col("n_bots")).cast("double") /
        sum(col("n_offers")).cast("double"), 6).as("bot_share"),
      F.avgFromSums(sum(F.dec(col("spread"))), count(lit(1))).as("avg_spread"),
      median(col("spread")).as("median_spread"),
      max(col("spread")).as("max_spread"),
      min(col("min_price")).as("best_entry_price"),
      min(col("predicted_min_24h")).as("best_floor_24h"))

  /** One merged seller offer inside an [[AnalyzeResult]] document
    * (reference: the sellers array assembled at scrape.ts:779-817).
    */
  case class SellerOffer(
      seller_key: String, seller: String, source: String, price: Long,
      delivery_date: Option[String], n_merged: Long, is_bot: Boolean)

  /** Per-variant stats block of the document. */
  case class VariantStats(
      n_offers: Long, min_price: Long, max_price: Long, n_bots: Long,
      spread: Long, predicted_min_24h: Double)

  /** The nested analyze-result document — SURVEY §1.3's promised
    * `Dataset[AnalyzeResult]` shape (ArrayType(StructType) sellers +
    * a stats struct), typed end-to-end.
    */
  case class AnalyzeResult(
      product_id: String, sellers: Seq[SellerOffer], stats: VariantStats)

  /** Flat flagged-offer row feeding the typed assembly (non-private:
    * Catalyst's generated encoder projections cannot access private
    * classes — the StreamEmbed rule).
    */
  case class FlaggedOffer(
      product_id: String, seller_key: String, seller: String, source: String,
      price: Long, delivery_date: Option[String], n_merged: Long,
      is_bot: Boolean)

  /** TYPED document assembly — the reference's per-variant analyze
    * entry (scrape.ts:779-788: productId + sellers + stats; the
    * master-level wrapper at :809-817 nests these) as a
    * `Dataset[AnalyzeResult]`: the flagged-offer rows group per product
    * and fold into one nested case-class document (sellers array sorted
    * by merge key + the stats block), with compile-time field safety
    * through the whole assembly. Per-product stats computed here are
    * definitionally identical to [[analyzePipeline]]'s aggregate form
    * (TypedAnalyzeSpec pins the global row hash-equal).
    *
    * Scale shape: one groupByKey on the product key — the same single
    * shuffle the DataFrame groupBy pays — then a per-group fold whose
    * state is one product's offer list (bounded by sellers-per-product,
    * a small constant at any corpus size). The DataFrame form remains
    * the catalog row: `mapGroups` is opaque to Catalyst (no partial
    * aggregation, no codegen), the documented cost of the typed
    * surface; the document Dataset is the API a caller who wants the
    * reference's nested object gets.
    */
  def analyzeResults(
      spark: SparkSession, dir: String): Dataset[AnalyzeResult] = {
    import spark.implicits._
    flaggedOffers(spark, dir)
      .select(col("product_id"), col("seller_key"), col("seller"),
        col("source"), col("price"), col("delivery_date"), col("n_merged"),
        col("is_bot"))
      .as[FlaggedOffer]
      .groupByKey(_.product_id)
      .mapGroups { (pid, it) =>
        val offers = it.toSeq.sortBy(_.seller_key)
        val nBots = offers.count(_.is_bot).toLong
        val mn = offers.map(_.price).min
        val mx = offers.map(_.price).max
        val pred =
          if (nBots >= 2) math.max(0.0, mn.toDouble - 200.0) else mn.toDouble
        AnalyzeResult(
          pid,
          offers.map(o => SellerOffer(o.seller_key, o.seller, o.source,
            o.price, o.delivery_date, o.n_merged, o.is_bot)),
          VariantStats(offers.size.toLong, mn, mx, nBots, mx - mn, pred))
      }
  }

  /** [[analyzePipeline]] recomposed from the TYPED documents: unpack
    * each [[AnalyzeResult]]'s stats block and run the identical global
    * aggregate — the equality TypedAnalyzeSpec asserts against the
    * DataFrame row.
    */
  def analyzePipelineTyped(spark: SparkSession, dir: String): DataFrame =
    globalAgg(analyzeResults(spark, dir)
      .select(col("product_id"), col("stats.n_offers").as("n_offers"),
        col("stats.min_price").as("min_price"),
        col("stats.max_price").as("max_price"),
        col("stats.n_bots").as("n_bots"),
        col("stats.spread").as("spread"),
        col("stats.predicted_min_24h").as("predicted_min_24h")))

  /** S12/X15/X17/X13/X14 — embedded configurator payload: balanced-JSON
    * extraction via the native [[ExtractBalancedJson]] expression, then
    * schema-flexible JSON probing of the parsed document.
    */
  def extractConfig(spark: SparkSession, dir: String): DataFrame = {
    val cfg = ExtractBalancedJson(spark, col("value"),
      lit("BACKEND.components.configurator ="))
    page(spark).select(
      cfg.as("config_json"),
      get_json_object(cfg, "$.title").as("title"),
      get_json_object(cfg, "$.meta.brand").as("brand"),
      json_array_length(get_json_object(cfg, "$.variants")).cast("long")
        .as("n_variants"),
      get_json_object(cfg, "$.variants[0].code").as("first_code"),
      Html.sizeNumber(get_json_object(cfg, "$.variants[0].size"))
        .as("first_size_num"),
      Html.colorCap(get_json_object(cfg, "$.color")).as("color"))
  }
}
