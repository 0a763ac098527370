package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Out, Tables}
import graft.functions.F

/** Item-affinity analytics over order baskets: market-basket
  * co-occurrence with lift, and PageRank over the co-purchase graph —
  * the "customers who bought X" surface, and a demonstration that an
  * ITERATIVE graph algorithm is expressible as a fixed chain of
  * dataframe joins (no driver loop over collected data; each iteration
  * is one co-partitioned join + one partial-aggregated groupBy).
  *
  * Scale shapes:
  *   - The basket self-join fans out per order as C(basket, 2); basket
  *     size is bounded by the order model (≤ ~10 lines), so the join is
  *     a bounded-fanout equi-join on orderkey — never a corpus-level
  *     cross product. This is the a-priori candidate-generation shape.
  *   - The pair/item count frames are aggregates keyed by part — they
  *     shuffle once and sort-merge join; nothing corpus-sized is
  *     broadcast or collected.
  *   - PageRank keeps rank mass as fixed-scale DECIMAL with per-edge
  *     contributions rounded at 1e-10 (pure-IEEE), so the per-node sum
  *     is exact and shuffle-order-immune — the same determinism recipe
  *     as every aggregated double in the catalog, applied to an
  *     iterative fixpoint. Iteration count is a compile-time constant:
  *     the unrolled plan is 3 joins deep, which AQE re-plans stage by
  *     stage; at larger depth a production job would localCheckpoint
  *     between rounds exactly like TextOps.connectedComponents.
  */
object Affinity {

  private def li(spark: SparkSession, dir: String) =
    Tables.load(spark, dir, "lineitem")

  /** Minimum co-occurrence count for a pair to surface. */
  val BasketMinSupport = 2L

  /** PageRank damping factor and iteration count. */
  val PrDamping = 0.85
  val PrIters = 3

  /** Distinct (order, item) incidence — the basket relation. */
  private def incidence(spark: SparkSession, dir: String): DataFrame =
    li(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()

  /** Unordered co-purchase pairs (a < b) with their support count,
    * [[BasketMinSupport]]-filtered, over a given (ok, pk) incidence
    * frame — the single definition both [[basketLift]] and
    * [[itemPagerank]] build on. */
  private def pairsFrom(it: DataFrame): DataFrame =
    it.as("a").join(it.as("b"), Seq("ok"))
      .filter(col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= BasketMinSupport)

  private[graft] def basketPairs(spark: SparkSession, dir: String): DataFrame =
    pairsFrom(incidence(spark, dir))

  /** Market-basket lift: for every co-purchased pair,
    * lift = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b) — >1 means the
    * items attract each other beyond chance. All counts are exact
    * integers; the single derived double is one IEEE multiply-divide
    * chain, identical on both engines.
    */
  def basketLift(spark: SparkSession, dir: String): DataFrame = {
    val it = Out.eager(incidence(spark, dir))
    val nOrders = it.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val items = it.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val pairs = pairsFrom(it)
    val r = pairs
      .join(items.select(col("pk").as("part_a"), col("n_item").as("n_a")), Seq("part_a"))
      .join(items.select(col("pk").as("part_b"), col("n_item").as("n_b")), Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_pair"), col("n_a"), col("n_b"),
        F.roundHalfUp(
          col("n_pair").cast("double") * col("n_orders") /
            (col("n_a") * col("n_b")), 6).as("lift"))
    Out.sorted(r)(col("part_a"), col("part_b"))
  }

  /** PageRank over the undirected co-purchase graph (nodes = items
    * incident to a [[BasketMinSupport]]-qualified pair, so every node
    * has degree ≥ 1 and no mass dangles): [[PrIters]] rounds of
    * r ← (1−d)/N + d·Σ_in r(u)/deg(u), unrolled into the plan. The
    * damping is folded INTO the per-edge contribution before rounding,
    * so each round is base + an exact decimal sum.
    */
  def itemPagerank(spark: SparkSession, dir: String): DataFrame = {
    val pairs = basketPairs(spark, dir)
    val e = Out.eager(
      pairs.select(col("part_a").as("src"), col("part_b").as("dst"))
        .union(pairs.select(col("part_b").as("src"), col("part_a").as("dst"))))
    val deg = Out.eager(e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val nn = deg.agg(count(lit(1)).as("nn"))
    // materialized once: the unrolled iterations would otherwise
    // re-derive this frame (and its scalar crossJoin) every round
    val nodes = Out.eager(deg.crossJoin(broadcast(nn))
      .select(col("src").as("node"), col("deg"), col("nn")))
    val base = F.roundHalfUp(
      lit(1.0 - PrDamping) / col("nn").cast("double"), 10)
      .cast("decimal(20,10)")
    var ranks = nodes.select(col("node"), col("deg"), col("nn"),
      F.roundHalfUp(lit(1.0) / col("nn").cast("double"), 10)
        .cast("decimal(20,10)").as("r"))
    for (_ <- 1 to PrIters) {
      val contrib = e
        .join(ranks.select(col("node").as("src"), col("deg"), col("r")), Seq("src"))
        .select(col("dst").as("node"),
          F.roundHalfUp(
            lit(PrDamping) * col("r").cast("double") / col("deg").cast("double"), 10)
            .cast("decimal(20,10)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("deg"), col("nn"),
          (base + coalesce(col("s"), lit(0).cast("decimal(20,10)"))).as("r"))
    }
    val r = ranks.select(col("node"), col("deg"),
      F.roundHalfUp(col("r").cast("double"), 8).as("pagerank"))
    Out.sorted(r)(col("node"))
  }
}
