package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Scalar-function catalog (SURVEY.md §2.7) as pure `Column` combinators.
  *
  * Everything here compiles to built-in Catalyst expressions — no UDFs —
  * so the whole catalog stays inside whole-stage codegen and is usable at
  * 100 TB without serialization overhead. Each function cites the reference
  * behavior it reproduces.
  */
object F {

  /** Exact-sum decimal view of a double column.
    *
    * Aggregating IEEE doubles is order-dependent, which breaks
    * deterministic cross-engine comparison and makes retried/AQE-re-planned
    * stages non-reproducible at scale. Summing a fixed-scale decimal is
    * exact and associative, so partial aggregation (map-side combine) stays
    * correct under any partitioning. Stats that need doubles (avg, stddev)
    * are derived *after* the exact sums.
    */
  def dec(c: Column): Column = c.cast(DecimalType(20, 4))

  /** Half-up rounding via pure IEEE ops: floor(x*10^s + 0.5)/10^s.
    *
    * Engine-native `round` differs at exact .5 boundaries (Spark rounds
    * the decimal expansion HALF_UP, DuckDB the binary double — observed
    * divergence: 66894.5471875 → ...188 vs ...187). This formula is only
    * multiply/add/floor/divide on doubles, which IEEE 754 fully
    * determines, so any two engines agree bit-for-bit. Valid while
    * |x|*10^s < 2^53.
    */
  def roundHalfUp(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * lit(p) + lit(0.5)).cast("double") / lit(p)
  }

  /** Mean derived from an exact decimal sum: sum(dec(x)) / n, rounded to
    * 6 via [[roundHalfUp]] — unrounded derived doubles flake the
    * cross-engine gate at larger scale factors.
    */
  def avgFromSums(sumDec: Column, n: Column): Column =
    roundHalfUp(sumDec.cast("double") / n.cast("double"), 6)

  /** Addition-order-proof aggregate sum of an (already rounded) double
    * column: each value casts to an exact decimal at the given scale,
    * the decimals sum exactly (shuffle-order-immune), and the total
    * casts back to double. The idiom behind every cross-engine summed
    * double, packaged as an aggregate column.
    */
  def sumDecAsDouble(c: Column, scale: Int): Column =
    sum(c.cast(s"decimal(20,$scale)")).cast("double")

  /** Population stddev derived from exact sums:
    * roundHalfUp(sqrt(max(0, sumsq/n - (sum/n)^2)), 6). Deterministic
    * under reordering; rounded because decimal→double casts of sums whose
    * scaled integer exceeds 2^53 are not correctly rounded in every engine.
    */
  def stddevPopFromSums(sumDec: Column, sumSqDec: Column, n: Column): Column = {
    val nd = n.cast("double")
    val mean = sumDec.cast("double") / nd
    roundHalfUp(sqrt(greatest(lit(0.0), sumSqDec.cast("double") / nd - mean * mean)), 6)
  }

  /** X1 — tiered delivery fee (reference scripts/etl_sales.py:28-33):
    * price ≥ 15000 → 0; ≥ 10000 → 699; ≥ 5000 → 799; else 999;
    * plus max(0, ceil(weight_kg) - 3) * 399 per-kg surcharge.
    */
  def deliveryFee(priceKzt: Column, weightKg: Column): Column = {
    val base = when(priceKzt >= 15000, 0L)
      .when(priceKzt >= 10000, 699L)
      .when(priceKzt >= 5000, 799L)
      .otherwise(999L)
    val surcharge = greatest(lit(0L), ceil(weightKg).cast(LongType) - 3L) * 399L
    base + surcharge
  }

  /** X2 — reorder point (reference scripts/dashboard.py:8-10):
    * ceil(daily*lead + z * (daily*0.2) * sqrt(lead)); z = 1.65 (95% service).
    */
  def reorderPoint(dailyDemand: Column, leadDays: Int, z: Double = 1.65): Column =
    ceil(dailyDemand * lit(leadDays.toDouble) +
      lit(z) * (dailyDemand * lit(0.2)) * lit(math.sqrt(leadDays.toDouble)))

  /** X3 — net revenue (reference scripts/dashboard.py:31,52,68):
    * gross*(1-fee_pct) - delivery_cost.
    */
  def netRevenue(gross: Column, feePct: Column, deliveryCost: Column): Column =
    gross * (lit(1.0) - feePct) - deliveryCost

  /** X4 — clean_weight (reference enhanced_catalog_parser.py:27-40):
    * comma→dot, strip non-[0-9.], cast-or-null. try_cast = pandas
    * `errors='coerce'` and stays null-on-garbage under ANSI mode.
    */
  def cleanWeight(raw: Column): Column =
    regexp_replace(regexp_replace(raw, ",", "."), "[^0-9.]", "").try_cast("double")

  /** X5 — clean_price (reference enhanced_catalog_parser.py:43-54):
    * comma-decimal aware, strip currency/space → integral KZT or null.
    * The reference truncates (`int(float(s))`), so the long cast is an
    * explicit floor — engines disagree on double→int rounding otherwise.
    */
  def cleanPrice(raw: Column): Column =
    floor(cleanWeight(raw)).try_cast(LongType)

  /** X6 — clean_stock (reference enhanced_catalog_parser.py:57-67):
    * strip non-digits → int, default 0.
    */
  def cleanStock(raw: Column): Column =
    coalesce(regexp_replace(raw, "[^0-9]", "").try_cast("int"), lit(0))

  /** X7 — key normalization (reference etl_sales.py:18,62,65):
    * trim + uppercase. */
  def normKey(raw: Column): Column = upper(trim(raw))

  /** X8 — day-first date parse with coercion (reference
    * etl_sales.py:59-60, etl_purchases.py:46-47): try d.M.yyyy (padded
    * or not), fall back to ISO, null on garbage (`errors='coerce'`).
    */
  def dayFirstDate(raw: Column): Column =
    coalesce(
      try_to_timestamp(trim(raw), lit("d.M.yyyy")),
      try_to_timestamp(trim(raw), lit("yyyy-M-d"))).cast("date")

  /** X11 — price text → number (reference server/parse.ts:17-18). */
  def priceTextToLong(raw: Column): Column =
    regexp_replace(raw, "[^0-9]", "").try_cast(LongType)

  /** X12 — trailing id from href (reference server/scrape.ts:39-42). */
  def idFromHref(href: Column): Column =
    regexp_extract(href, "-(\\d+)/?$", 1)

  /** X18 — pricebot target price (reference PRICEBOT_SPEC_V2.md:96-98):
    * no competitor → clamp(current, [minP, maxP]);
    * else min(max(lowestComp - step, minP), maxP);
    * hysteresis: keep current when |target - current| <= step.
    */
  def targetPrice(current: Column, lowestComp: Column,
                  minP: Column, maxP: Column, step: Column): Column = {
    val clamped = least(greatest(current, minP), maxP)
    val chased = least(greatest(lowestComp - step, minP), maxP)
    val target = when(lowestComp.isNull, clamped).otherwise(chased)
    when(abs(target - current) <= step, current).otherwise(target)
  }

  /** X21 — price stability score (reference server/scrape.ts:749-754):
    * round((1 - min(1, stddev/min)) * 100). TS Math.round is half-up =
    * floor(x + 0.5), which [[roundHalfUp]] at scale 0 reproduces exactly.
    */
  def stabilityScore(stddev: Column, minPrice: Column): Column =
    roundHalfUp((lit(1.0) - least(lit(1.0), stddev / minPrice)) * 100, 0)
      .cast(LongType)

  /** X19 — price-bot heuristic (reference server/scrape.ts:719-732), with
    * thresholds as parameters: delta = price - groupMin; bot when
    * (delta <= nearAbs || delta/min <= nearPct) && (median - min <= tight).
    */
  def isPriceBot(price: Column, groupMin: Column, groupMedian: Column,
                 nearAbs: Double, nearPct: Double, tight: Double): Column = {
    val delta = price - groupMin
    val nearMin = delta >= 0 && delta <= nearAbs
    // Reference guards the ratio (`min > 0 ? delta/min : 0`, scrape.ts:723):
    // at min = 0 an unguarded Divide is NULL in Spark but inf in IEEE
    // engines, diverging cross-engine. pct = 0 when min <= 0, and
    // 0 <= nearPct always holds, so the branch reduces to delta >= 0.
    val pctOk = when(groupMin > 0,
      delta.cast("double") / groupMin.cast("double") <= nearPct)
      .otherwise(lit(true))
    val nearPctC = delta >= 0 && pctOk
    (nearMin || nearPctC) && (groupMedian - groupMin <= tight)
  }
}
