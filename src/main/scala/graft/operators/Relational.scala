package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Out, Tables}
import graft.functions.F

/** Relational operator catalog (SURVEY.md §2.2–§2.6) re-expressed as lazy
  * Spark plans over the canonical tables.
  *
  * Design rules applied throughout (these are the 100 TB rules, not
  * small-data conveniences):
  *   - Aggregations sum fixed-scale decimals (exact, associative) so
  *     map-side partial aggregation and AQE re-planning cannot change
  *     results; doubles are derived after the exact sums (see [[F.dec]]).
  *   - Dimension sides of joins (`part`, settings, size chart) are
  *     broadcast — no shuffle of the fact table for lookup enrichment.
  *   - Per-group statistics needed alongside row detail are WINDOW
  *     aggregates, never aggregate-then-rejoin: a window reuses the
  *     shuffle the grouping already paid; a rejoin pays it twice plus a
  *     join.
  *   - Terminal ORDER BYs run only under `graft.sort.results` (see
  *     [[graft.Out.sorted]]): they exist for deterministic verify dumps,
  *     not as part of the engine's work.
  *   - No UDFs: everything is built-in Catalyst expressions and stays in
  *     whole-stage codegen.
  */
object Relational {

  private def li(spark: SparkSession, dir: String) = Tables.load(spark, dir, "lineitem")
  private def part(spark: SparkSession, dir: String) = Tables.load(spark, dir, "part")
  private def ord(spark: SparkSession, dir: String) = Tables.load(spark, dir, "orders")
  private def cust(spark: SparkSession, dir: String) = Tables.load(spark, dir, "customer")
  private def ev(spark: SparkSession, dir: String) = Tables.load(spark, dir, "events")

  /** A1/A2/A6 + X3 — pricing summary: grouped exact sums + derived stats.
    * Mirrors the reference's KPI aggregations (scripts/dashboard.py:27-56).
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val r = li(spark, dir)
      .withColumn("net", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(F.dec(col("l_quantity"))).as("sq"),
        sum(F.dec(col("l_extendedprice"))).as("sg"),
        sum(F.dec(col("net"))).as("sn"),
        sum(F.dec(col("l_extendedprice") * col("l_extendedprice"))).as("sg2"))
      .select(
        col("l_returnflag"), col("l_linestatus"), col("n_rows"),
        col("sq").cast("double").as("sum_qty"),
        col("sg").cast("double").as("sum_gross"),
        col("sn").cast("double").as("sum_net"),
        F.avgFromSums(col("sg"), col("n_rows")).as("avg_price"),
        F.stddevPopFromSums(col("sg"), col("sg2"), col("n_rows")).as("stddev_price"))
    Out.sorted(r)(col("l_returnflag"), col("l_linestatus"))
  }

  /** A3/J1/X1/X3 — the flagship "margin by SKU" slice
    * (reference scripts/dashboard.py:67-73 + etl_sales.py:28-33,61-66):
    * enrich the fact table with a broadcast dimension, derive the tiered
    * delivery fee and net revenue, aggregate per SKU, rank by margin.
    */
  def marginBySku(spark: SparkSession, dir: String): DataFrame = {
    val fee = F.deliveryFee(col("l_extendedprice"), col("p_size") * lit(0.3))
    val r = li(spark, dir)
      .join(broadcast(part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .withColumn("net", F.netRevenue(col("l_extendedprice"), col("l_discount"), fee))
      .groupBy(col("l_partkey").as("sku"))
      .agg(sum(F.dec(col("net"))).as("m"), count(lit(1)).as("n_lines"))
      .select(col("sku"), col("m").cast("double").as("margin_kzt"), col("n_lines"))
    Out.sorted(r)(desc("margin_kzt"), asc("sku"))
  }

  /** F2/A1/W1 — daily demand over the trailing 30-day window anchored at
    * max(ship date) (reference scripts/dashboard.py:35-36). The scalar
    * anchor is a 1-row aggregate broadcast-cross-joined in — no driver
    * collect. The anchor pass re-scans lineitem, but column pruning means
    * it reads ONE column; at any scale that is the cheapest correct way to
    * get a data-dependent filter bound (a full-table window max would
    * shuffle everything to compute the same scalar).
    */
  def dailyDemand(spark: SparkSession, dir: String): DataFrame = {
    val l = li(spark, dir)
    val anchor = l.agg(max(col("l_shipdate")).as("anchor"))
    val r = l.crossJoin(broadcast(anchor))
      .filter(col("l_shipdate") >= col("anchor") - expr("INTERVAL 30 DAY"))
      .groupBy(col("l_partkey").as("sku"))
      .agg(sum(F.dec(col("l_quantity"))).as("sq"))
      .select(col("sku"),
        F.roundHalfUp(col("sq").cast("double") / 30.0, 6).as("daily_demand"))
    Out.sorted(r)(col("sku"))
  }

  /** J3/X2/F9/O1 — inventory panel: stock ⟕ demand, reorder point, flag,
    * sort urgent-first (reference scripts/dashboard.py:35-46).
    */
  def inventoryReorder(spark: SparkSession, dir: String): DataFrame = {
    val demand = dailyDemand(spark, dir)
    val stock = part(spark, dir)
      .select(col("p_partkey").as("sku"),
        (col("p_size") * 10).cast("long").as("qty_on_hand"))
    val dd = coalesce(col("daily_demand"), lit(0.0))
    val r = stock.join(demand, Seq("sku"), "left")
      .select(
        col("sku"), col("qty_on_hand"),
        dd.as("daily_demand"),
        F.reorderPoint(dd, leadDays = 14).cast("long").as("reorder_point"),
        (col("qty_on_hand") <= F.reorderPoint(dd, leadDays = 14)).as("need_reorder"))
    Out.sorted(r)(desc("need_reorder"), asc("sku"))
  }

  /** A4/W4 — value_counts head-N with deterministic tie-break
    * (reference scripts/etl_catalog_simple.py:138-147). The sort feeds a
    * LIMIT so it runs as TakeOrdered (no global sort) — kept unconditional.
    */
  def brandValueCounts(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("p_brand"))
      .limit(5)

  /** A5/F9 — conditional counts per group
    * (reference enhanced_catalog_parser.py:263-275, pricebot stats/route.ts:28-33).
    */
  def conditionalCounts(spark: SparkSession, dir: String): DataFrame = {
    val r = ord(spark, dir)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
        sum(F.dec(col("o_totalprice"))).as("st"))
      .select(col("o_orderpriority"), col("n_orders"), col("n_open"),
        col("n_finished"), col("st").cast("double").as("sum_total"))
    Out.sorted(r)(col("o_orderpriority"))
  }

  /** A6 — global scalar KPIs (reference scripts/dashboard.py:27-32). */
  def globalKpis(spark: SparkSession, dir: String): DataFrame =
    ord(spark, dir)
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        sum(F.dec(col("o_totalprice"))).as("st"))
      .select(col("n_orders"), col("n_customers"),
        col("st").cast("double").as("revenue"),
        F.avgFromSums(col("st"), col("n_orders")).as("avg_order_value"))

  /** A7/X21 — per-group order-statistics block: min/max/exact-median/avg/
    * stddev_pop/spread + stability score (reference server/scrape.ts:710-718,
    * 749-754). Exact median via `median` (not approx) per SURVEY §7 risk (a).
    */
  def sellerStats(spark: SparkSession, dir: String): DataFrame = {
    val r = li(spark, dir)
      .groupBy(col("l_partkey").as("sku"))
      .agg(
        count(lit(1)).as("n_offers"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        median(col("l_extendedprice")).as("median_price"),
        sum(F.dec(col("l_extendedprice"))).as("sp"),
        sum(F.dec(col("l_extendedprice") * col("l_extendedprice"))).as("sp2"))
      .select(
        col("sku"), col("n_offers"), col("min_price"), col("max_price"),
        (col("max_price") - col("min_price")).as("spread"),
        col("median_price"),
        F.avgFromSums(col("sp"), col("n_offers")).as("avg_price"),
        F.stddevPopFromSums(col("sp"), col("sp2"), col("n_offers")).as("stddev_price"))
      .withColumn("stability",
        F.stabilityScore(col("stddev_price"), col("min_price")))
    Out.sorted(r)(col("sku"))
  }

  /** A8 — count-distinct sellers per group (reference KpiCards.tsx:16-21).
    * Exact here; at 100 TB swap to approx_count_distinct where tolerable.
    */
  def uniqueSuppliersPerBrand(spark: SparkSession, dir: String): DataFrame = {
    val r = li(spark, dir)
      .join(broadcast(part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_lines"))
    Out.sorted(r)(col("p_brand"))
  }

  /** A9 — global analytics over per-group spreads: second-level aggregate
    * (reference README.md:61-72, AnalyticsPanel.tsx:9-36).
    */
  def globalAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val stats = sellerStats(spark, dir)
    stats.agg(
        count(lit(1)).as("n_skus"),
        sum(F.dec(col("spread"))).as("ss"),
        median(col("spread")).as("median_spread"),
        max(col("spread")).as("max_spread"),
        sum(when(col("spread") <= 1000.0, 1L).otherwise(0L)).as("n_tight"),
        min(col("min_price")).as("best_entry_price"))
      .select(
        col("n_skus"),
        F.avgFromSums(col("ss"), col("n_skus")).as("avg_spread"),
        col("median_spread"), col("max_spread"),
        F.roundHalfUp(col("n_tight").cast("double") / col("n_skus").cast("double"), 6)
          .as("tight_share"),
        col("best_entry_price"))
  }

  /** W2 — per-row delta vs group minimum (reference SellersTable.tsx:21-36,
    * scrape.ts:721-723). Window min, no self-join.
    */
  def deltaVsMin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
    val r = li(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey").as("sku"),
        col("l_extendedprice").as("price"),
        min(col("l_extendedprice")).over(w).as("min_price"))
      .withColumn("delta", col("price") - col("min_price"))
      .withColumn("delta_pct",
        F.roundHalfUp(col("delta") / col("min_price") * 100.0, 4))
    Out.sorted(r)(col("l_orderkey"), col("l_linenumber"))
  }

  /** W3 — top-k cheapest per group via row_number (reference
    * price_watch.ts:66). Fully deterministic ordering keys.
    */
  def top3CheapestPerSku(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_extendedprice").asc, col("l_suppkey").asc,
        col("l_orderkey").asc, col("l_linenumber").asc)
    val r = li(spark, dir)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("l_partkey").as("sku"), col("rank"),
        col("l_suppkey").as("seller"), col("l_extendedprice").as("price"))
    Out.sorted(r)(col("sku"), col("rank"))
  }

  /** J8/W5 — range join + best-match + top-3 alternatives (reference
    * size_recommendation_engine.py:165-227). The size chart is a tiny
    * broadcast dimension; the range predicate runs as a broadcast
    * nested-loop join — the scalable plan for fact×tiny-theta-dim.
    */
  def sizeRecommend(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val chart = Seq(
      (140, 155, 40, 55, "XS"), (150, 165, 50, 65, "S"),
      (160, 175, 60, 75, "M"), (170, 185, 70, 85, "L"),
      (180, 195, 80, 95, "XL"), (190, 210, 90, 120, "XXL"))
      .toDF("h_min", "h_max", "w_min", "w_max", "size")
    val customers = cust(spark, dir).select(
      col("c_custkey"),
      (lit(150) + col("c_custkey") % 50).cast("int").as("height"),
      (lit(50) + col("c_custkey") % 60).cast("int").as("weight"))
    val score =
      -(abs((col("h_min") + col("h_max")) / 2.0 - col("height")) +
        abs((col("w_min") + col("w_max")) / 2.0 - col("weight")))
    val cand = customers
      .join(broadcast(chart),
        col("height").between(col("h_min"), col("h_max")) &&
          col("weight").between(col("w_min"), col("w_max")))
      .withColumn("score", score)
    val w = Window.partitionBy(col("c_custkey"))
      .orderBy(desc("score"), asc("size"))
    val ranked = cand.withColumn("rn", row_number().over(w))
    val agg = ranked.groupBy("c_custkey").agg(
      max(when(col("rn") === 1, col("size"))).as("best_size"),
      count(lit(1)).as("n_candidates"),
      concat_ws(",",
        transform(
          slice(array_sort(collect_list(struct(col("rn"), col("size")))), 2, 3),
          x => x.getField("size"))).as("alt_sizes"))
    val r = customers.join(agg, Seq("c_custkey"), "left")
      .select(col("c_custkey"), col("height"), col("weight"),
        coalesce(col("best_size"), lit("NONE")).as("best_size"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("alt_sizes"), lit("")).as("alt_sizes"))
    Out.sorted(r)(col("c_custkey"))
  }

  /** W6/X22 — sliding count over the last 5 observations per key: the
    * batch form of the streaming bot detector (reference
    * price_watch.ts:31-52). Frame = ROWS BETWEEN 4 PRECEDING AND CURRENT.
    */
  def slidingUndercut(spark: SparkSession, dir: String): DataFrame = {
    val r = slidingUndercutOver(ev(spark, dir))
    Out.sorted(r)(col("user_id"), col("event_id"))
  }

  /** Core of [[slidingUndercut]], reused by the streaming batch-equivalence
    * test: works over any frame with (event_id, user_id, value).
    */
  def slidingUndercutOver(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val seq5 = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(-4, 0)
    events
      .withColumn("min_value", min(col("value")).over(byUser))
      .withColumn("undercut",
        when(col("value") <= col("min_value") + 50.0, 1L).otherwise(0L))
      .withColumn("sliding_hits", sum(col("undercut")).over(seq5))
      .withColumn("is_bot", col("sliding_hits") >= 3)
      .select("event_id", "user_id", "undercut", "sliding_hits", "is_bot")
  }

  /** T3 batch form — running-min undercut: each observation compared to
    * the lowest value seen SO FAR for its user (the reference's stream
    * semantics, price_watch.ts:40-46), sliding last-5 window, bot flag.
    * This is the exact batch equivalent of
    * [[graft.streaming.WatchStream.detectBots]]; the streaming suite
    * asserts equality of the two.
    */
  def runningUndercut(spark: SparkSession, dir: String): DataFrame = {
    val runMin = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val seq5 = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(-4, 0)
    val r = ev(spark, dir)
      .withColumn("running_min", min(col("value")).over(runMin))
      .withColumn("undercut",
        when(col("value") <= col("running_min") + 50.0, 1L).otherwise(0L))
      .withColumn("sliding_hits", sum(col("undercut")).over(seq5))
      .withColumn("is_bot", col("sliding_hits") >= 3)
      .select("event_id", "user_id", "undercut", "sliding_hits", "is_bot")
    Out.sorted(r)(col("user_id"), col("event_id"))
  }

  /** D2/O2 — group-dedup with merge policy: per key keep lowest price +
    * earliest date (reference server/scrape.ts:543-563).
    */
  def dedupMerge(spark: SparkSession, dir: String): DataFrame = {
    val r = li(spark, dir)
      .groupBy(col("l_partkey").as("sku"), col("l_suppkey").as("seller"))
      .agg(
        min(col("l_extendedprice")).as("best_price"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("first_ship_date"),
        count(lit(1)).as("n_merged"))
    Out.sorted(r)(col("sku"), col("seller"))
  }

  /** D1/D3 — keyed dedup, deterministic first-wins via min(key)
    * (reference etl_purchases.py:55, scrape.ts:324,339). Groups on the
    * NATIVE date and formats after the aggregate — grouping on a
    * formatted string pays per-row formatting and a wider shuffle key.
    */
  def firstOrderPerCustomerDay(spark: SparkSession, dir: String): DataFrame = {
    val r = ord(spark, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(min(col("o_orderkey")).as("first_order"), count(lit(1)).as("n_dups"))
      .select(col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("first_order"), col("n_dups"))
    Out.sorted(r)(col("o_custkey"), col("order_date"))
  }

  /** U1 — union-all of homogeneous slices then aggregate
    * (reference etl_sales.py:41-73 per-file concat).
    */
  def unionAllFlags(spark: SparkSession, dir: String): DataFrame = {
    val l = li(spark, dir)
    val r = l.filter(col("l_returnflag") === "A")
      .unionByName(l.filter(col("l_returnflag") === "R"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(F.dec(col("l_quantity"))).as("sq"))
      .select(col("l_returnflag"), col("n"), col("sq").cast("double").as("sum_qty"))
    Out.sorted(r)(col("l_returnflag"))
  }

  /** J5/F6 — anti-join over a recent window: customers with no order in
    * the trailing 90 days anchored at max(o_orderdate) (reference
    * etl_catalog_api.py:235-244 new-product detection). The window makes
    * the check non-vacuous on the testdata (every customer has SOME
    * order, so an unfiltered anti-join returns 0 rows and verifies
    * nothing).
    */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = ord(spark, dir)
    val anchor = o.agg(max(col("o_orderdate")).as("anchor"))
    val recent = o.crossJoin(broadcast(anchor))
      .filter(col("o_orderdate") >= col("anchor") - expr("INTERVAL 90 DAY"))
    val r = cust(spark, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    Out.sorted(r)(col("c_custkey"))
  }

  /** J1/J2 — left join + coalesce fallback key (reference
    * etl_sales.py:64-65).
    */
  def ordersWithCustomerName(spark: SparkSession, dir: String): DataFrame = {
    val r = ord(spark, dir)
      .join(broadcast(cust(spark, dir)),
        col("o_custkey") === col("c_custkey"), "left")
      .select(
        col("o_orderkey"),
        coalesce(col("c_name"),
          concat(lit("UNKNOWN-"), col("o_custkey").cast("string"))).as("cust_name"),
        col("o_totalprice"))
    Out.sorted(r)(col("o_orderkey"))
  }

  /** X18/J6/A10 — pricebot target price with clamping + hysteresis
    * (reference PRICEBOT_SPEC_V2.md:96-98, run/route.ts:25-41).
    */
  def targetPrices(spark: SparkSession, dir: String): DataFrame = {
    val comp = li(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(min(col("l_extendedprice")).as("lowest_comp"))
    val r = part(spark, dir)
      .join(comp, col("p_partkey") === col("l_partkey"), "left")
      .select(
        col("p_partkey").as("sku"),
        col("p_retailprice").as("current_price"),
        col("lowest_comp"),
        F.targetPrice(
          col("p_retailprice"), col("lowest_comp"),
          F.roundHalfUp(col("p_retailprice") * 0.8, 2),
          F.roundHalfUp(col("p_retailprice") * 1.2, 2),
          lit(50.0)).as("target_price"))
    Out.sorted(r)(col("sku"))
  }

  /** As-of join, composed from built-ins (the scalable form): for every
    * purchase event, the value of the user's latest PRIOR click —
    * attribution semantics. Instead of a range join (which explodes to
    * per-pair comparison), both sides union into one frame and an
    * ignore-nulls `last` window carries the most recent click forward:
    * ONE shuffle by user, one sort, linear scan. This is the as-of
    * pattern that survives 100 TB; Spark needs no custom operator for
    * it (cf. SURVEY §4 — no custom strategy warranted).
    */
  def asOfAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val tagged = e
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        when(col("event_type") === "click", col("value")).as("click_value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = tagged
      .withColumn("asof_click_value",
        last(col("click_value"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("value").as("purchase_value"),
        col("asof_click_value"),
        col("asof_click_value").isNotNull.as("has_prior_click"))
    Out.sorted(r)(col("event_id"))
  }

  /** Skew-safe two-phase (salted) aggregation: phase 1 aggregates on
    * (key, salt) so a hot key's rows spread over `salts` reducers; phase
    * 2 combines the partials per key. Results are identical to a direct
    * groupBy — the point is the SHAPE: at 100 TB a single hot SKU
    * funnels its whole row set through one reducer in the direct plan,
    * while the salted plan bounds any reducer's load at hot/salts. The
    * salt is derived from a second column (not random) so the query
    * stays deterministic and retry-safe. Exposed as a query so the
    * technique is oracle-verified equal to the plain aggregation.
    */
  def saltedSkuStats(spark: SparkSession, dir: String): DataFrame = {
    val salts = 8
    val phase1 = li(spark, dir)
      .withColumn("salt", pmod(col("l_suppkey"), lit(salts)))
      .groupBy(col("l_partkey"), col("salt"))
      .agg(
        count(lit(1)).as("pn"),
        sum(F.dec(col("l_quantity"))).as("pq"),
        min(col("l_extendedprice")).as("pmin"))
    val r = phase1.groupBy(col("l_partkey").as("sku"))
      .agg(
        sum(col("pn")).as("n_lines"),
        sum(col("pq")).cast("double").as("sum_qty"),
        min(col("pmin")).as("min_price"))
    Out.sorted(r)(col("sku"))
  }

  /** Skew-safe SALTED fact-fact join: the probe side salts each row
    * deterministically (a second column mod `salts` — no RNG, so the
    * plan is retry-safe), the build side replicates once per salt, and
    * the join key becomes (key, salt) — a hot order key's rows spread
    * over `salts` reducers instead of funneling through one. The result
    * multiset is identical to the plain join (every probe row meets
    * exactly one replica of its match), which the oracle verifies as a
    * plain SQL join. Complements [[saltedSkuStats]] (salted AGGREGATION)
    * and the AQE path SkewJoinSpec pins (runtime skew-split is the
    * zero-rewrite remedy; salting is the one that works even where AQE
    * cannot, e.g. under a deterministic-partitioning requirement or a
    * non-shuffle-read consumer). The merge hint keeps the demonstrated
    * shape a shuffle join — broadcasting the build side would bypass
    * the skew entirely, which is a different (size-limited) remedy.
    */
  def saltedOrderRevenue(spark: SparkSession, dir: String): DataFrame = {
    val salts = 8
    val l = li(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
        pmod(col("l_linenumber"), lit(salts)).as("lsalt"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        explode(array((0 until salts).map(lit(_)): _*)).as("osalt"))
    val r = l.hint("merge")
      .join(o, col("l_orderkey") === col("o_orderkey") && col("lsalt") === col("osalt"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(F.dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("sum_revenue"))
    Out.sorted(r)(col("o_orderstatus"))
  }

  /** Shared offers pipeline for X19/X20: dedup to per-(sku, seller) best
    * price, then per-sku min/median as WINDOW aggregates over the deduped
    * frame. One shuffle for the dedup, one for the window — the round-1
    * aggregate-then-rejoin shape paid three shuffles plus a join, and was
    * the most expensive query in the bench. The subsequent groupBy("sku")
    * in [[priceFloor]] reuses the window's hash partitioning (no new
    * exchange).
    */
  private def offersWithBotFlags(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("sku"))
    li(spark, dir)
      .groupBy(col("l_partkey").as("sku"), col("l_suppkey").as("seller"))
      .agg(min(col("l_extendedprice")).as("price"))
      .withColumn("mn", min(col("price")).over(w))
      .withColumn("md", median(col("price")).over(w))
      .withColumn("is_bot",
        F.isPriceBot(col("price"), col("mn"), col("md"),
          nearAbs = 100.0, nearPct = 0.0025, tight = 3000.0))
  }

  /** X19 — bot-flag heuristic over deduped per-seller offers (reference
    * server/scrape.ts:719-732); thresholds scaled to the testdata's price
    * range, structure identical.
    */
  def botFlags(spark: SparkSession, dir: String): DataFrame = {
    val r = offersWithBotFlags(spark, dir)
      .select("sku", "seller", "price", "is_bot")
    Out.sorted(r)(col("sku"), col("seller"))
  }

  /** A9 attractivenessIndex — per-SKU market-attractiveness blend
    * (reference README.md:61-72; the implementing module is absent from
    * the reference snapshot, so per SURVEY §7f the weights are
    * ENGINE-DEFINED and documented here): wider-than-median spread is
    * opportunity (+0.4, capped at 2× median), bot-free markets score
    * higher (+0.3), and fewer competing sellers score higher (+0.3,
    * hyperbolic in the seller count). No rating term — the testdata has
    * no rating column. The global median-spread anchor is a 1-row
    * broadcast, same pattern as [[dailyDemand]].
    */
  def attractiveness(spark: SparkSession, dir: String): DataFrame = {
    val perSku = offersWithBotFlags(spark, dir)
      .groupBy("sku")
      .agg(
        count(lit(1)).as("n_sellers"),
        sum(when(col("is_bot"), 1L).otherwise(0L)).as("n_bots"),
        (max(col("price")) - min(col("price"))).as("spread"))
    val anchor = perSku.agg(median(col("spread")).as("med_spread"))
    val spreadRatio = when(col("med_spread") > 0,
      least(col("spread") / col("med_spread"), lit(2.0))).otherwise(lit(0.0))
    val botShare = col("n_bots").cast("double") / col("n_sellers").cast("double")
    val index = F.roundHalfUp(
      lit(0.4) * (spreadRatio / 2.0) +
        lit(0.3) * (lit(1.0) - botShare) +
        lit(0.3) / (lit(1.0) + col("n_sellers").cast("double") / 10.0), 6)
    val r = perSku.crossJoin(broadcast(anchor))
      .select(col("sku"), col("n_sellers"), col("n_bots"), col("spread"),
        F.roundHalfUp(botShare, 6).as("bot_share"),
        index.as("attractiveness"))
    Out.sorted(r)(col("sku"))
  }

  /** X20 — price-floor prediction from bot density (reference
    * server/scrape.ts:735-747). Continues the [[offersWithBotFlags]]
    * pipeline without re-deriving it.
    */
  def priceFloor(spark: SparkSession, dir: String): DataFrame = {
    val r = offersWithBotFlags(spark, dir)
      .groupBy("sku")
      .agg(
        sum(when(col("is_bot"), 1L).otherwise(0L)).as("n_bots"),
        min(col("price")).as("min_price"))
      .select(col("sku"), col("n_bots"), col("min_price"),
        when(col("n_bots") >= 2, greatest(lit(0.0), col("min_price") - 200.0))
          .otherwise(col("min_price")).as("predicted_min_24h"),
        when(col("n_bots") >= 2, greatest(lit(0.0), col("min_price") - 400.0))
          .otherwise(col("min_price")).as("predicted_min_7d"))
    Out.sorted(r)(col("sku"))
  }

  /** OLAP subtotal surface — ROLLUP over (returnflag, linestatus) with
    * the grouping bitmask: detail rows, per-flag subtotals and the
    * grand total in ONE pass (Spark expands grouping sets before the
    * aggregate, so it is still a single map-side-combinable
    * HashAggregate + one shuffle — not one job per level). Sums ride
    * the exact-decimal recipe; `grouping_id()` bit order (first column
    * = MSB) matches the SQL standard GROUPING() both engines share.
    */
  def salesRollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val r = li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(20,4)")).cast("double")
          .as("sum_qty"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(20,4)")).cast("double").as("sum_revenue"))
    Out.sorted(r)(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  /** Slowly-changing-dimension (type 2) history build: collapse the
    * per-(sku, day) price observation stream into VERSIONED validity
    * intervals — one row per consecutive run of an unchanged price,
    * with `valid_from` / `valid_to` (next version's start; null while
    * current) and the observed-day count. The warehouse-standard
    * change-detection shape: lag() marks changes, a running sum
    * numbers the runs (gap-islands), one grouping collapses them, and
    * lead() closes the intervals. No joins, no MERGE — the history IS
    * a query over the observation log.
    *
    * Scale shape: one shuffle on sku; the two windows and the
    * grouping all reuse that partitioning. At 100 TB the observation
    * log is the fact table and this plan is one pass over it.
    */
  def priceHistoryScd2(spark: SparkSession, dir: String): DataFrame =
    priceHistoryScd2From(
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_partkey") < 100)
        .groupBy(col("l_partkey").as("sku"), col("l_shipdate").as("day"))
        .agg(min(col("l_extendedprice")).as("price")))

  /** Same over any (sku, day, price) observation frame — lets specs
    * plant a revisited price and watch it open a NEW version (history,
    * not dedup: A→B→A is three versions). */
  private[graft] def priceHistoryScd2From(obs: DataFrame): DataFrame = {
    val wDay = Window.partitionBy("sku").orderBy("day")
    val runs = obs
      .withColumn("changed",
        when(lag(col("price"), 1).over(wDay).isNull ||
          lag(col("price"), 1).over(wDay) =!= col("price"), 1L).otherwise(0L))
      .withColumn("version",
        sum(col("changed")).over(
          wDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wVer = Window.partitionBy("sku").orderBy("version")
    val r = runs.groupBy("sku", "version")
      .agg(min(col("price")).as("price"),
        min(col("day")).as("from_day"),
        count(lit(1)).as("n_days"))
      .withColumn("next_from", lead(col("from_day"), 1).over(wVer))
      .select(col("sku"), col("version"), col("price"),
        date_format(col("from_day"), "yyyy-MM-dd").as("valid_from"),
        date_format(col("next_from"), "yyyy-MM-dd").as("valid_to"),
        col("next_from").isNull.as("is_current"), col("n_days"))
    Out.sorted(r)(col("sku"), col("version"))
  }

  /** Time-series regularization — date-spine gap fill with
    * last-observation-carried-forward: the irregular per-(sku, day)
    * price observations become a DENSE daily series over a fixed
    * calendar spine, missing days filled from the most recent earlier
    * observation (null before the first one), each row flagged
    * observed/filled. The dashboarding prerequisite every BI layer
    * needs over event-shaped data.
    *
    * Scale shape: the spine is a 365-row broadcast; the grid is
    * keys × days — exactly the requested OUTPUT, not a working blowup;
    * the left join and the LOCF window both ride one shuffle on the
    * key. `last(ignoreNulls)` over a running frame is O(1) state per
    * row — no per-gap scans.
    */
  def dailyPriceFill(spark: SparkSession, dir: String): DataFrame = {
    val obs = Tables.load(spark, dir, "lineitem")
      .filter(col("l_partkey") < 30 &&
        col("l_shipdate").between("1995-01-01", "1995-12-31"))
      .groupBy(col("l_partkey").as("sku"), col("l_shipdate").as("d"))
      .agg(min(col("l_extendedprice")).as("p"))
    val spine = spark.range(1).select(explode(expr(
      "sequence(to_date('1995-01-01'), to_date('1995-12-31'), interval 1 day)"))
      .as("d"))
    val w = Window.partitionBy("sku").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = obs.select("sku").distinct()
      .crossJoin(broadcast(spine))
      .join(obs, Seq("sku", "d"), "left")
      .withColumn("price", last(col("p"), ignoreNulls = true).over(w))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("sku"),
        col("price"), col("p").isNotNull.as("is_observed"))
    Out.sorted(r)(col("sku"), col("day"))
  }

  /** Rolling z-score anomaly detection constants: each (sku, day) price
    * is scored against the trailing [[AnomalyLookback]] observed days of
    * the same sku (current day excluded — the score must not see the
    * value it judges), requires [[AnomalyMinObs]] priors to score at
    * all, flags |z| ≥ [[AnomalyZ]]. */
  private[graft] val AnomalyLookback = 14
  private[graft] val AnomalyMinObs = 8
  private[graft] val AnomalyZ = 2.5

  /** Time-series anomaly detection — trailing-window z-score over the
    * per-sku daily price series (the monitoring twin of the reference's
    * price-stability score, server/scrape.ts:749-754: where stability
    * summarizes dispersion, this flags the individual days that break
    * it). A day's min price is scored against the mean/stddev of its
    * sku's previous ≤14 observed days; days with fewer than 8 priors or
    * zero dispersion get a null score and are never flagged.
    *
    * Scale shape: ONE exchange end to end — the explicit repartition on
    * sku satisfies both the (sku, day) grouping's clustering requirement
    * (subset key) and the window's, so the daily rollup and the trailing
    * frame ride the same shuffle. The frame is rows-bounded (≤14), so
    * window state is O(1) per row; exact decimal sums make the rolling
    * mean/stddev shuffle-order-immune (same derivations as
    * [[sellerStats]]).
    */
  def priceAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val daily = li(spark, dir)
      .repartition(col("l_partkey"))
      .groupBy(col("l_partkey").as("sku"), col("l_shipdate").as("d"))
      .agg(min(col("l_extendedprice")).as("p"))
    val hist = Window.partitionBy("sku").orderBy("d")
      .rowsBetween(-AnomalyLookback, -1)
    val scoreable = col("n_prior") >= AnomalyMinObs
    val r = daily
      .withColumn("n_prior", count(col("p")).over(hist))
      .withColumn("sp", sum(F.dec(col("p"))).over(hist))
      .withColumn("sp2", sum(F.dec(col("p") * col("p"))).over(hist))
      .withColumn("mean_prior",
        when(scoreable, F.avgFromSums(col("sp"), col("n_prior"))))
      .withColumn("std_prior",
        when(scoreable,
          F.stddevPopFromSums(col("sp"), col("sp2"), col("n_prior"))))
      .withColumn("z_score",
        when(scoreable && col("std_prior") > 0.0,
          F.roundHalfUp((col("p") - col("mean_prior")) / col("std_prior"), 6)))
      .withColumn("is_anomaly",
        scoreable && col("std_prior") > 0.0 && abs(col("z_score")) >= AnomalyZ)
      .select(col("sku"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("p").as("price"), col("n_prior"), col("mean_prior"),
        col("z_score"), col("is_anomaly"))
    Out.sorted(r)(col("sku"), col("day"))
  }

  /** OLAP cube — all four grouping combinations of
    * (orderstatus, orderpriority) in ONE pass. Like [[salesRollup]],
    * Spark expands the grouping sets BEFORE the aggregate, so the cube
    * is a single map-side-combinable HashAggregate + one shuffle (4×
    * the pre-combine rows, not 4 jobs); `grouping_id()` uses the
    * SQL-standard bit order (first column = MSB) both engines share.
    */
  def salesCube(spark: SparkSession, dir: String): DataFrame = {
    val r = ord(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        sum(F.dec(col("o_totalprice"))).cast("double").as("sum_total"))
    Out.sorted(r)(col("gid"), col("o_orderstatus"), col("o_orderpriority"))
  }

  /** Pivot value list: fixed in code, NOT discovered with a distinct
    * scan. At 100 TB `pivot(col)` without explicit values costs an
    * extra full pass (and a driver collect) just to learn the column
    * set; the event taxonomy is part of the schema contract, so it
    * belongs in code. */
  private[graft] val EventTypes =
    Seq("click", "error", "purchase", "signup", "view")

  /** Daily event-type matrix (shared by [[eventPivot]] and
    * [[eventUnpivot]]): one row per day, one count column per event
    * type. With the explicit value list the pivot compiles to a single
    * HashAggregate of `count(CASE WHEN type = v)` columns — one shuffle
    * on day, map-side combinable, no second pass. Absent (day, type)
    * cells surface as null from pivot and are pinned to 0 here. */
  private def eventDailyWide(spark: SparkSession, dir: String): DataFrame = {
    val p = ev(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    p.select(
      date_format(col("day"), "yyyy-MM-dd").as("day") +:
        EventTypes.map(t => coalesce(col(s"`$t`"), lit(0L)).as(s"n_$t")): _*)
  }

  /** Long→wide pivot: the daily event matrix (P-surface counterpart of
    * the conditional-count aggregations — same plan shape, but the
    * categories become SCHEMA, which is what a dashboard or feature
    * store consumes). */
  def eventPivot(spark: SparkSession, dir: String): DataFrame =
    Out.sorted(eventDailyWide(spark, dir))(col("day"))

  /** Wide→long unpivot (melt) of the same matrix: every (day, type)
    * cell becomes a row — INCLUDING explicit zero cells, which a plain
    * group-by can never emit (absent combinations simply don't exist in
    * the input). Spark's `unpivot` is a zero-shuffle map-side expansion
    * of the wide frame; the dense long form is what regularized
    * time-series consumers (forecasters, anomaly scorers) need.
    */
  def eventUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = eventDailyWide(spark, dir)
    val long = wide.unpivot(
      Array(col("day")),
      EventTypes.map(t => col(s"n_$t")).toArray,
      "event_type", "n_events")
    val r = long.select(col("day"),
      regexp_replace(col("event_type"), "^n_", "").as("event_type"),
      col("n_events"))
    Out.sorted(r)(col("day"), col("event_type"))
  }

  /** Trailing window of the binned interval join, in microseconds
    * (6 h): a purchase at t matches clicks in [t − W, t). */
  private[graft] val RangeJoinWindowUs = 6L * 3600L * 1000000L

  /** Batch interval join via time-bin bucketing — for every purchase,
    * the count and value sum of the same user's clicks in the trailing
    * [[RangeJoinWindowUs]] window. The naive form is a θ-join
    * (`p.user = c.user AND c.s BETWEEN p.t − W AND p.t`), which Spark
    * can only execute as a broadcast nested loop — quadratic per user
    * and a non-starter at 100 TB. Binning makes it an EQUI-join: bin
    * width = the window length W, each click is replicated into its own
    * bin and the next (2× fanout, constant), each purchase probes
    * exactly its own bin — every candidate pair lands in one
    * sort-merge/hash join on (user, bin), then an exact residual filter
    * keeps the true window. One bounded-fanout shuffle instead of a
    * per-user cross product; AQE's skew split handles a hot (user, bin).
    * (The streaming twin is [[graft.streaming.StreamJoin]]; this is the
    * batch plan a backfill would run.)
    */
  /** The purchases frame and the binned purchase←click pair frame
    * shared by [[rangeJoinBinned]] and [[multiTouchAttribution]]:
    * (purchase p_id/t/value, click c_id/s/cv) for every click of the
    * same user in the purchase's trailing window. */
  private def purchaseClickPairs(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val w = RangeJoinWindowUs
    val e = ev(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        unix_micros(col("ts")).as("t"), col("value"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id"),
        unix_micros(col("ts")).as("s"), col("value").as("cv"))
      // a click serves purchases in its own bin and the next one only:
      // |t − s| < W bounds the bin distance to ≤ 1
      .withColumn("bin", explode(array(expr(s"s DIV $w"), expr(s"s DIV $w") + 1L)))
    val pairs = p.withColumn("bin", expr(s"t DIV $w"))
      .join(c, Seq("user_id", "bin"))
      .filter(col("s") < col("t") && col("s") >= col("t") - w)
    (p, pairs)
  }

  def rangeJoinBinned(spark: SparkSession, dir: String): DataFrame = {
    val (p, pairs) = purchaseClickPairs(spark, dir)
    val matched = pairs
      .groupBy("p_id").agg(
        count(lit(1)).as("n_prior_clicks"),
        sum(F.dec(col("cv"))).cast("double").as("sum_click_value"))
    val r = p.join(matched, Seq("p_id"), "left")
      .select(col("p_id").as("event_id"), col("user_id"),
        col("value").as("purchase_value"),
        coalesce(col("n_prior_clicks"), lit(0L)).as("n_prior_clicks"),
        coalesce(col("sum_click_value"), lit(0.0)).as("sum_click_value"))
    Out.sorted(r)(col("event_id"))
  }

  /** Time-decay half-life for [[multiTouchAttribution]], seconds. */
  private[graft] val DecayHalfLifeSecs = 3600.0

  /** Multi-touch attribution — every purchase's value distributed over
    * the user's prior clicks in the trailing window, under two models:
    * linear (equal credit) and time-decay (credit ∝ 2^(−Δ/half-life),
    * recency-weighted). Output is per CLICK: the total credit it earned
    * across all purchases it influenced — the marketing-analytics view
    * of which touchpoints drive revenue.
    *
    * Scale shape: rides the [[purchaseClickPairs]] binned equi-join (no
    * θ-join); per-purchase normalizers are a window over the pair frame
    * keyed by purchase (bounded by clicks-per-window); per-click credit
    * is one more partial-aggregated groupBy. Decay weights are rounded
    * at 6 dp and fixed to DECIMAL before every sum, so both the
    * normalizer and the credit totals are shuffle-order-immune.
    */
  def multiTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val (_, pairs) = purchaseClickPairs(spark, dir)
    val wDec = F.roundHalfUp(
      pow(lit(2.0),
        -((col("t") - col("s")).cast("double") / 1000000.0) / DecayHalfLifeSecs),
      6).cast("decimal(20,6)")
    val perPurchase = Window.partitionBy("p_id")
    val credited = pairs
      .withColumn("wdec", wDec)
      .withColumn("n", count(lit(1)).over(perPurchase))
      .withColumn("sw", sum(col("wdec")).over(perPurchase))
      .select(col("c_id"), col("p_id"),
        F.roundHalfUp(col("value") / col("n").cast("double"), 4)
          .cast("decimal(20,4)").as("lin"),
        F.roundHalfUp(
          col("value") * col("wdec").cast("double") / col("sw").cast("double"), 4)
          .cast("decimal(20,4)").as("dec"))
    val r = credited.groupBy("c_id").agg(
        count(lit(1)).as("n_purchases"),
        sum(col("lin")).cast("double").as("credit_linear"),
        sum(col("dec")).cast("double").as("credit_decay"))
      .withColumnRenamed("c_id", "click_id")
    Out.sorted(r)(col("click_id"))
  }

  /** Cohort retention matrix — users grouped by the week of their FIRST
    * event; for each (cohort, weeks-since) cell, how many of them were
    * still active. The standard product-analytics retention triangle.
    *
    * Scale shape: one user-keyed aggregation finds each user's cohort
    * week (map-side combinable min), one distinct collapses activity to
    * (user, week) before any join — so the join input is bounded by
    * users × weeks, not raw events — and the cell rollup is a second
    * small aggregation. The cohort-size frame joins back on cohort week
    * (tiny, broadcast). Nothing is collected; no window over the raw
    * event stream.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("w"))
    val cohort = e.groupBy("user_id").agg(min(col("w")).as("cw"))
    val active = e.distinct()
      .join(cohort, Seq("user_id"))
      .select(col("user_id"), col("cw"),
        expr("datediff(w, cw) DIV 7").as("week_index"))
      .distinct()
    val cells = active.groupBy("cw", "week_index")
      .agg(count(lit(1)).as("n_active"))
    val sizes = cohort.groupBy("cw").agg(count(lit(1)).as("cohort_size"))
    val r = cells.join(broadcast(sizes), Seq("cw"))
      .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_index"), col("n_active"), col("cohort_size"),
        F.roundHalfUp(
          col("n_active").cast("double") / col("cohort_size").cast("double"), 6)
          .as("retention"))
    Out.sorted(r)(col("cohort_week"), col("week_index"))
  }

  /** Grouped boxplot — per returnflag: exact quartiles, IQR, Tukey
    * fences and outlier counts over the price distribution. Quartiles
    * are EXACT at cent granularity without sorting rows: prices
    * collapse to per-(group, cent) counts first, so the cumulative
    * window runs over DISTINCT VALUES per group (bounded by the price
    * domain, ~10⁷ cells at worst), not over corpus rows; the rank
    * convention is ceil(n·p/100) — all-integer, engine-independent —
    * and the fences/outlier counts are one more conditional aggregate
    * over the same value-count frame. The robust-statistics profile a
    * monitoring layer wants, shaped for any corpus size.
    */
  def priceBoxplot(spark: SparkSession, dir: String): DataFrame = {
    val cents = li(spark, dir).select(col("l_returnflag").as("flag"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c"))
    val vc = Out.eager(
      cents.groupBy("flag", "c").agg(count(lit(1)).as("vcnt")))
    val wcum = Window.partitionBy("flag").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vc
      .withColumn("vcum", sum(col("vcnt")).over(wcum))
      .withColumn("n", sum(col("vcnt")).over(Window.partitionBy("flag")))
    def quartile(p: Int) =
      min(when(col("vcum") >= expr(s"(n * $p + 99) DIV 100"), col("c")))
    val qs = cum.groupBy("flag").agg(
      max(col("n")).as("n_rows"),
      quartile(25).as("q25c"), quartile(50).as("q50c"), quartile(75).as("q75c"))
    val fenced = qs
      .withColumn("iqrc", col("q75c") - col("q25c"))
      .withColumn("lof", col("q25c") - expr("(3 * iqrc) DIV 2"))
      .withColumn("hif", col("q75c") + expr("(3 * iqrc) DIV 2"))
    val outliers = vc
      .join(broadcast(fenced.select(col("flag"), col("lof"), col("hif"))), Seq("flag"))
      .groupBy("flag").agg(
        sum(when(col("c") < col("lof"), col("vcnt")).otherwise(0L))
          .as("n_low_outliers"),
        sum(when(col("c") > col("hif"), col("vcnt")).otherwise(0L))
          .as("n_high_outliers"))
    val r = fenced.join(outliers, Seq("flag"))
      .select(col("flag"), col("n_rows"),
        (col("q25c").cast("double") / 100.0).as("q25"),
        (col("q50c").cast("double") / 100.0).as("median"),
        (col("q75c").cast("double") / 100.0).as("q75"),
        (col("iqrc").cast("double") / 100.0).as("iqr"),
        col("n_low_outliers"), col("n_high_outliers"))
    Out.sorted(r)(col("flag"))
  }

  /** CDC log compaction — a change-data-capture stream (insert/update/
    * delete ops with a per-key sequence) reduced to final table state:
    * last op wins per key, a trailing delete removes the key. The
    * MERGE-free apply path every lakehouse table format runs under the
    * hood (log compaction semantics). The event stream stands in as
    * the op log: signup→I, click→U, error→D, ordered by event_id.
    *
    * Scale shape: ONE shuffle on the key powers both windows (the
    * keep-last row_number and the per-key op count reuse the same
    * partitioning); no self-join against a "latest" snapshot, no
    * driver-side merge. At 100 TB this runs per partition of the log
    * and is exactly how compaction jobs are shaped.
    */
  def cdcCompact(spark: SparkSession, dir: String): DataFrame = {
    val ops = ev(spark, dir)
      .filter(col("event_type").isin("signup", "click", "error"))
      .select(col("user_id").as("key"), col("event_id").as("seq"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "click", "U")
          .otherwise("D").as("op"),
        col("value"))
    val wLast = Window.partitionBy("key").orderBy(col("seq").desc)
    val wKey = Window.partitionBy("key")
    val r = ops
      .withColumn("rn", row_number().over(wLast))
      .withColumn("n_ops", count(lit(1)).over(wKey))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("key").as("user_id"), col("value").as("current_value"),
        col("op").as("last_op"), col("n_ops"))
    Out.sorted(r)(col("user_id"))
  }

  /** Data-quality audit (the Deequ/Great-Expectations surface): a
    * fixed battery of constraints evaluated as aggregates, one result
    * row per constraint with checked/violation counts. Same-table
    * constraints share ONE aggregation pass (conditional counts — no
    * per-constraint scans); the referential-integrity check is a
    * left-anti count; uniqueness compares count to count_distinct.
    * At 100 TB this is the nightly gate: every check is a
    * map-side-combinable aggregate or one anti-join, never a collect.
    */
  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = ord(spark, dir)
    val ordersAgg = o.agg(
      count(lit(1)).as("n"),
      count_distinct(col("o_orderkey")).as("n_keys"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("bad_price"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("bad_status"))
    val orphanAgg = li(spark, dir)
      .join(o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .crossJoin(broadcast(li(spark, dir).agg(count(lit(1)).as("n_li"))))
    val ordersChecks = ordersAgg.select(
      array(
        struct(lit("orders.o_orderkey unique").as("constraint"),
          col("n").as("n_checked"), (col("n") - col("n_keys")).as("n_violations")),
        struct(lit("orders.o_custkey not null").as("constraint"),
          col("n").as("n_checked"), col("null_cust").as("n_violations")),
        struct(lit("orders.o_totalprice positive").as("constraint"),
          col("n").as("n_checked"), col("bad_price").as("n_violations")),
        struct(lit("orders.o_orderstatus in (O,F,P)").as("constraint"),
          col("n").as("n_checked"), col("bad_status").as("n_violations")))
        .as("checks"))
      .select(explode(col("checks")).as("c"))
      .select(col("c.constraint"), col("c.n_checked"), col("c.n_violations"))
    val refCheck = orphanAgg.select(
      lit("lineitem.l_orderkey references orders").as("constraint"),
      col("n_li").as("n_checked"), col("n_orphans").as("n_violations"))
    val r = ordersChecks.unionByName(refCheck)
      .withColumn("passed", col("n_violations") === 0L)
    Out.sorted(r)(col("constraint"))
  }

  /** Benford's-law first-digit audit over order totals — the classic
    * statistical fraud screen. Digit extraction is pure integer/string
    * arithmetic (no log10 near the bucketing); expected shares
    * log10(1+1/d) are compile-time literals printed into both engines.
    * One aggregation over the fact table, 9-row output.
    */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    val digit = substring(
      floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
      .cast("int")
    val counts = ord(spark, dir)
      .filter(col("o_totalprice") >= 1.0)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val expected = Relational.BenfordExpected.zipWithIndex
      .map { case (p, i) => (i + 1, p) }
      .foldLeft(when(lit(false), 0.0)) { case (acc, (d, p)) =>
        acc.when(col("digit") === d, p)
      }
    val tot = Window.partitionBy() // 9-row frame: bounded
    val r = counts
      .withColumn("n_total", sum(col("n_obs")).over(tot))
      .select(col("digit"), col("n_obs"),
        F.roundHalfUp(col("n_obs").cast("double") / col("n_total").cast("double"), 6)
          .as("obs_share"),
        expected.as("exp_share"))
      .withColumn("abs_dev",
        F.roundHalfUp(abs(col("obs_share") - col("exp_share")), 6))
    Out.sorted(r)(col("digit"))
  }

  /** log10(1 + 1/d) for d = 1..9, printed into both engines verbatim. */
  private[graft] val BenfordExpected: Seq[Double] =
    (1 to 9).map(d => math.floor(math.log10(1.0 + 1.0 / d) * 1e6 + 0.5) / 1e6)

  /** Star-schema rollup (the TPC-H Q5 shape): revenue by nation and
    * order year through the full dimension chain
    * region → nation → customer → orders → lineitem, region-filtered.
    * The query that exercises Catalyst's join ordering: the region
    * filter prunes nations BEFORE any fact-table work, the nation
    * (and at this SF, customer) dims broadcast so the fact table
    * shuffles at most once (on orderkey for the lineitem join), and
    * the final rollup is one map-side-combinable aggregate. At 100 TB
    * customer outgrows the broadcast threshold and AQE falls back to a
    * shuffle join for exactly that edge — the plan degrades joint by
    * joint instead of breaking.
    */
  def starRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region")
      .filter(col("r_name") === "ASIA")
    val nationF = Tables.load(spark, dir, "nation")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val custF = cust(spark, dir)
      .join(broadcast(nationF), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val r = ord(spark, dir)
      .join(custF, col("o_custkey") === col("c_custkey"))
      .join(li(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("order_year"))
      .agg(
        count(lit(1)).as("n_lineitems"),
        sum(F.dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("revenue"))
    Out.sorted(r)(col("n_name"), col("order_year"))
  }

  /** Per-group OLS trend — least-squares slope/intercept of each sku's
    * daily price series, from the closed-form normal equations over
    * FIVE exact sums (n, Σx, Σx², Σy, Σxy): the scalable form of
    * grouped regression. x is an integer day index and y rides the
    * exact-decimal recipe, so every sum is map-side-combinable and
    * shuffle-order-immune; the two derived doubles (slope, intercept)
    * are single IEEE expression chains over those sums, intercept
    * computed from the ROUNDED slope so both engines agree bit-for-bit.
    * One aggregation pass — no window, no per-group iteration, any
    * group count. Degenerate series (single day) yield null slope.
    */
  def priceTrend(spark: SparkSession, dir: String): DataFrame = {
    val obs = li(spark, dir)
      .groupBy(col("l_partkey").as("sku"), col("l_shipdate").as("d"))
      .agg(min(col("l_extendedprice")).as("p"))
      .select(col("sku"),
        datediff(col("d"), to_date(lit("1995-01-01"))).cast("long").as("x"),
        col("p"))
    val s = obs.groupBy("sku").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sx2"),
      sum(F.dec(col("p"))).as("sy"),
      sum(col("x") * F.dec(col("p"))).as("sxy"))
    val denom = col("n") * col("sx2") - col("sx") * col("sx")
    val slope = when(col("n") >= 2 && denom =!= 0L,
      F.roundHalfUp(
        (col("n") * col("sxy").cast("double") - col("sx") * col("sy").cast("double")) /
          denom.cast("double"), 6))
    val r = s.withColumn("slope", slope)
      .withColumn("intercept",
        when(col("slope").isNotNull,
          F.roundHalfUp(
            (col("sy").cast("double") - col("slope") * col("sx").cast("double")) /
              col("n").cast("double"), 6)))
      .select(col("sku"), col("n").as("n_days"), col("slope"), col("intercept"),
        when(col("slope") > 0.01, "up")
          .when(col("slope") < -0.01, "down")
          .when(col("slope").isNotNull, "flat").as("trend"))
    Out.sorted(r)(col("sku"))
  }

  /** Point-in-time (PIT) join — each fact row enriched with the
    * dimension version that was valid AT THE FACT'S OWN TIME, against
    * the [[priceHistoryScd2]] history. This is the feature-store
    * correctness join: joining facts to the CURRENT dimension row leaks
    * the future into training data; the PIT join never does.
    *
    * Scale shape: the naive form is a range join of facts to validity
    * intervals (θ-join — nested loop). Here both frames union into one
    * sku-keyed stream ordered by (day, kind) — version opens sort
    * before same-day facts — and ONE ignore-nulls last() window carries
    * the active version onto every fact row: one shuffle, one sort,
    * linear scan, any history length. The same as-of shape as
    * [[asOfAttribution]], applied across TWO tables.
    */
  def pitJoin(spark: SparkSession, dir: String): DataFrame = {
    val hist = priceHistoryScd2(spark, dir)
      .select(col("sku"), to_date(col("valid_from")).as("d"),
        col("version"), col("price"), lit(0).as("kind"))
    val facts = li(spark, dir)
      .filter(col("l_partkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey").as("sku"), col("l_shipdate").as("d"))
      .withColumn("version", lit(null).cast("long"))
      .withColumn("price", lit(null).cast("double"))
      .withColumn("kind", lit(1))
      .select(col("sku"), col("d"), col("version"), col("price"), col("kind"),
        col("l_orderkey"), col("l_linenumber"))
    val unioned = hist
      .withColumn("l_orderkey", lit(null).cast("long"))
      .withColumn("l_linenumber", lit(null).cast("long"))
      .unionByName(facts)
    val w = Window.partitionBy("sku").orderBy(col("d"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = unioned
      .withColumn("asof_version", last(col("version"), ignoreNulls = true).over(w))
      .withColumn("asof_price", last(col("price"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("l_orderkey"), col("l_linenumber"), col("sku"),
        date_format(col("d"), "yyyy-MM-dd").as("ship_day"),
        col("asof_version"), col("asof_price"))
    Out.sorted(r)(col("l_orderkey"), col("l_linenumber"))
  }

  /** First-order Markov transition matrix over the per-user event
    * stream: counts and conditional probabilities of event_type →
    * next event_type. The "what happens after a click" surface that
    * feeds next-event prediction and journey analysis.
    *
    * Scale shape: one shuffle on user_id powers the lead() window
    * (deterministic (ts, event_id) ordering); the transition rollup is
    * a |types|² aggregation — constant-size output regardless of
    * corpus; row-normalization is a window over that constant frame.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = ev(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val rowTotal = Window.partitionBy("from_type")
    val r = trans
      .withColumn("n_from", sum(col("n")).over(rowTotal))
      .select(col("from_type"), col("to_type"), col("n"),
        F.roundHalfUp(col("n").cast("double") / col("n_from").cast("double"), 6)
          .as("p"))
    Out.sorted(r)(col("from_type"), col("to_type"))
  }
}
