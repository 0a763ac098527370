package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.{Out, Tables}

/** D2 exact-merge policy as a typed [[Aggregator]] (SURVEY.md §7 risk b).
  *
  * The reference dedupes sellers per lowercased name keeping (a) the
  * LOWEST price, (b) the FIRST-SEEN original-case name, and (c) a
  * non-empty delivery string in preference to an empty one
  * (server/scrape.ts:543-563). "First seen" is an iteration-order notion
  * that does not exist in a distributed shuffle, so the engine makes it
  * explicit: every observation carries a deterministic sequence number
  * and "first" means minimal sequence. That makes the merge associative
  * and commutative — safe under partial aggregation, AQE re-planning and
  * retries at any scale.
  */
object SellerMerge {

  /** One observation: seq = deterministic arrival order. */
  case class Obs(seq: Long, name_raw: String, price: Double, delivery: String)

  /** Merge buffer: running winners for each policy dimension. */
  case class Buf(minPrice: Double, firstSeq: Long, firstName: String,
                 delivSeq: Long, delivery: String, n: Long)

  case class Merged(seller_name: String, best_price: Double,
                    delivery: String, n_merged: Long)

  private val Empty = Buf(Double.MaxValue, Long.MaxValue, "", Long.MaxValue, "", 0L)

  /** Delivery ranking: non-empty beats empty, then earliest sequence. */
  private def delivRank(delivery: String, seq: Long): Long =
    if (delivery.nonEmpty) seq else Long.MaxValue - 1

  val agg: Aggregator[Obs, Buf, Merged] = new Aggregator[Obs, Buf, Merged] {
    def zero: Buf = Empty

    def reduce(b: Buf, o: Obs): Buf = {
      val dr = delivRank(o.delivery, o.seq)
      Buf(
        math.min(b.minPrice, o.price),
        math.min(b.firstSeq, o.seq),
        if (o.seq < b.firstSeq) o.name_raw else b.firstName,
        math.min(b.delivSeq, dr),
        if (dr < b.delivSeq) o.delivery else b.delivery,
        b.n + 1)
    }

    def merge(a: Buf, b: Buf): Buf =
      Buf(
        math.min(a.minPrice, b.minPrice),
        math.min(a.firstSeq, b.firstSeq),
        if (a.firstSeq <= b.firstSeq) a.firstName else b.firstName,
        math.min(a.delivSeq, b.delivSeq),
        if (a.delivSeq <= b.delivSeq) a.delivery else b.delivery,
        a.n + b.n)

    def finish(b: Buf): Merged =
      Merged(b.firstName, b.minPrice, b.delivery, b.n)

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Merged] = Encoders.product[Merged]
  }

  /** q_dedup_policy — the D2 merge over synthetic case-noisy seller
    * observations derived from lineitem ⨝ supplier: seq is
    * (orderkey, linenumber) linearized, names carry deterministic case
    * noise, and return-flag "N" rows model an empty delivery string. The
    * oracle reproduces the policy with arg_min.
    *
    * The query path is pure built-ins — `min_by` over the same rank
    * expressions the typed [[agg]] uses — so it stays in whole-stage
    * codegen / HashAggregate with map-side partial aggregation (the
    * typed-Aggregator formulation paid per-row encoder round-trips and
    * ran ~10× slower). [[agg]] remains the reusable exact-policy API;
    * SellerMergeSpec pins both formulations to the same result.
    */
  def dedupPolicy(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val sup = Tables.load(spark, dir, "supplier")
    val obs = li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(
        col("l_partkey").as("sku"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("seq"),
        when(col("l_linenumber") % 2 === 1, upper(col("s_name")))
          .otherwise(col("s_name")).as("name_raw"),
        col("l_extendedprice").as("price"),
        when(col("l_returnflag") === "N", lit(""))
          .otherwise(concat(lit("return-"), col("l_returnflag"))).as("delivery"))
    val merged = mergeBuiltin(obs)
    Out.sorted(merged)(col("sku"), col("seller_key"))
  }

  /** Built-in-only D2 merge: same policy as [[agg]], expressed as
    * `min_by`/`min` over (sku, lower(trim(name_raw))). Codegen-friendly
    * (HashAggregate with partial agg); seq uniqueness makes every
    * `min_by` deterministic, and the empty-delivery rank
    * (Long.MaxValue-1) only ties when every delivery in the group is
    * empty — where the tied values are all equal anyway.
    */
  def mergeBuiltin(obs: DataFrame): DataFrame =
    obs
      .withColumn("seller_key", lower(trim(col("name_raw"))))
      .groupBy(col("sku"), col("seller_key"))
      .agg(
        min_by(col("name_raw"), col("seq")).as("seller_name"),
        min(col("price")).as("best_price"),
        min_by(col("delivery"),
          when(col("delivery") === "", lit(Long.MaxValue - 1))
            .otherwise(col("seq"))).as("delivery"),
        count(lit(1)).as("n_merged"))
      .select("sku", "seller_key", "seller_name", "best_price", "delivery", "n_merged")
}
