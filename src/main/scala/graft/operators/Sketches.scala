package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Out, Tables}

/** Mergeable sketches for heavy-hitter detection (SURVEY custom-operator
  * rule (a): composed from built-in ops; the "novel sketch" slot of the
  * design brief).
  *
  * Count-min sketch: [[Depth]] pairwise-independent hash rows ×
  * [[Width]] counters. Point estimate = min over rows of the addressed
  * counter; estimates NEVER undercount (each counter sums the true
  * count plus non-negative collision mass) — the invariant the oracle
  * checks per key, not just statistically.
  *
  * Scale contract: the sketch build is one groupBy over (row, bucket) —
  * map-side combinable, fixed [[Depth]]×[[Width]] memory no matter how
  * many distinct keys stream through, and two sketches merge by cell
  * addition — the properties that make CMS the standard heavy-hitter
  * structure over 100 TB streams where exact per-key counts would need
  * unbounded state. Probing broadcasts the (tiny) sketch to the probe
  * keys.
  *
  * Hash family: h_d(x) = ((a_d·md5_60(x) + b_d) mod P) mod W with
  * md5-derived (a, b) — deterministic integer arithmetic any engine
  * reproduces bit-for-bit (same family as the MinHash permutations).
  */
object Sketches {

  val Depth = 4
  val Width = 64
  val P: Long = TextOps.MinhashPrime

  /** Probe set size: the true top-N keys are re-estimated via the CMS. */
  val TopN = 10

  /** Deterministic (a, b) per hash row, derived from md5 so the oracle
    * embeds identical literals. a is never 0.
    */
  lazy val cmsParams: IndexedSeq[(Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    IndexedSeq.tabulate(Depth) { d =>
      def word(tag: String): Long = {
        val hex = md.digest(s"cms_${tag}_$d".getBytes("UTF-8"))
          .take(7).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16) % P
      }
      (math.max(1L, word("a")), word("b"))
    }
  }

  /** 60-bit md5 key hash (the shared engine/oracle idiom). */
  private def keyHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") % P

  private def bucketOf(h: Column, d: Int): Column = {
    val (a, b) = cmsParams(d)
    (lit(a) * h + lit(b)) % P % Width
  }

  /** Sketch build over a single `key` column: explode each key into its
    * Depth (row, bucket) cells, then ONE map-side-combinable groupBy —
    * the whole sketch is Depth×Width cells regardless of key
    * cardinality, and two sketches merge by cell-wise addition
    * (SketchesSpec pins the merge law).
    */
  private[graft] def cmsCells(keys: DataFrame): DataFrame = {
    val h = keyHash(col("key"))
    keys
      .select(posexplode(array((0 until Depth).map(d => bucketOf(h, d)): _*))
        .as(Seq("d", "bucket")))
      .groupBy("d", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for every distinct key of a `key` column frame
    * against a cell frame: min over hash rows of the addressed counter.
    */
  private[graft] def cmsEstimates(keys: DataFrame, cells: DataFrame): DataFrame =
    keys.distinct()
      .select(col("key"),
        posexplode(array((0 until Depth).map(d => bucketOf(keyHash(col("key")), d)): _*))
          .as(Seq("d", "bucket")))
      .join(broadcast(cells), Seq("d", "bucket"))
      .groupBy("key").agg(min(col("cnt")).as("cms_estimate"))

  /** KMV size: distinct-count estimates carry ~1/sqrt(k) relative
    * error; 32 keeps the sketch 32 doubles.
    */
  val KmvK = 32

  /** Normalized 60-bit md5 hash in [0, 1) — the KMV order statistic. */
  private def unitHash(key: Column): Column =
    keyHash(key).cast("double") / lit(P.toDouble)

  /** KMV (k-minimum-values) distinct-count sketch of a `key` column:
    * keep the [[KmvK]] smallest distinct normalized hashes; the
    * estimate is (k-1)/u_k with u_k the k-th smallest. Unlike HLL
    * (whose register layout is engine-private), KMV is pure order
    * statistics over a shared hash — DETERMINISTIC, so the oracle
    * hash-checks the estimate itself, not a tolerance band.
    *
    * Scale shape: distinct + orderBy + limit plans as partial top-k per
    * partition (TakeOrderedAndProject) — k values cross the wire per
    * partition, and two sketches merge by union∘sort∘take-k
    * (SketchesSpec pins the merge law).
    */
  private[graft] def kmvSketch(keys: DataFrame): DataFrame =
    keys.select(unitHash(col("key")).as("u")).distinct()
      .orderBy(col("u")).limit(KmvK)

  /** KMV distinct-count over orders customers, with the exact count
    * alongside — the estimate's fixed (deterministic) relative error is
    * part of the hash-checked output, documenting sketch quality on
    * this corpus rather than asserting a probabilistic bound.
    */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("key"))
    kmvReport(keys, kmvSketch(keys))
  }

  /** The KMV estimate read-off over an ALREADY-BUILT sketch frame (`u`
    * column) — shared by the batch query and the streaming-maintenance
    * oracle query (q_kmv_stream), whose sketch comes from the
    * union∘sort∘take-k merge of per-micro-batch sketches. The merge is
    * EXACT (the k smallest distinct hashes of a union are the k smallest
    * of the merged k-min sets), so both paths hash-match one oracle.
    */
  private[graft] def kmvReport(keys: DataFrame, sk: DataFrame): DataFrame = {
    val uk = sk.agg(max(col("u")).as("u_k"), count(lit(1)).as("k"))
    val truth = keys.agg(countDistinct(col("key")).as("true_distinct"))
    val r = uk.crossJoin(truth).select(
      col("k"),
      graft.functions.F.roundHalfUp(col("u_k"), 6).as("u_k"),
      graft.functions.F.roundHalfUp((col("k") - 1).cast("double") / col("u_k"), 2)
        .as("kmv_estimate"),
      col("true_distinct"),
      graft.functions.F.roundHalfUp(
        abs((col("k") - 1).cast("double") / col("u_k") -
          col("true_distinct").cast("double")) /
          col("true_distinct").cast("double"), 4).as("rel_error"))
    r
  }

  /** HLL geometry: [[HllBuckets]] registers addressed by the low 6 bits
    * of the shared 60-bit md5 key hash (mod P keeps it under 2^31, so
    * the remaining suffix carries ≤ 25 bits and ρ ≤ [[HllMaxRho]]).
    */
  val HllBuckets = 64
  val HllMaxRho = 26
  val HllAlpha = 0.709 // α_m for m = 64 (Flajolet et al. 2007, fig. 3)

  /** α·m²·2^[[HllMaxRho]] precomputed ONCE in Scala and embedded as the
    * same double literal in the plan and the oracle SQL, so neither
    * engine's multiplication order can produce a different numerator.
    */
  lazy val HllNumerator: Double =
    HllAlpha * (HllBuckets.toDouble * HllBuckets.toDouble) *
      (1L << HllMaxRho).toDouble

  /** HLL register frame (bucket, m = max ρ) of a `key` column. ρ is the
    * least-significant-set-bit rank of the hash suffix (the original
    * Flajolet–Martin observable — geometric(1/2) exactly like the
    * leading-zero form, but expressible in pure integer arithmetic both
    * engines reproduce bit-for-bit: ρ = bit_count((w & −w) − 1) + 1,
    * ρ = [[HllMaxRho]] when the suffix is 0). One map-side-combinable
    * groupBy; the sketch is ≤ [[HllBuckets]] rows no matter how many
    * keys stream through, and two sketches merge by bucket-wise max
    * (SketchesSpec pins the merge law).
    */
  private[graft] def hllRegisters(keys: DataFrame): DataFrame = {
    val rho = when(col("w") === 0L, lit(HllMaxRho))
      .otherwise(bit_count(col("w").bitwiseAND(-col("w")) - 1) + 1)
    keys.select(keyHash(col("key")).as("hv"))
      .select((col("hv") % HllBuckets).as("bucket"),
        expr(s"hv DIV $HllBuckets").as("w"))
      .withColumn("rho", rho.cast("int"))
      .groupBy("bucket").agg(max(col("rho")).as("m"))
  }

  /** HLL distinct-count over orders customers with the exact count
    * alongside ([[kmvDistinct]]'s register-based sibling — fixed
    * 64-register memory vs KMV's k order statistics). The harmonic
    * denominator is kept as the INTEGER Σ 2^(maxρ − M_j) (empty
    * registers contribute 2^maxρ), so the only floating-point steps are
    * the final division and the standard small-range linear-counting
    * correction — both replayed identically by the oracle from embedded
    * literals, which is what lets a probabilistic sketch be
    * hash-checked exactly rather than tolerance-banded.
    */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("key"))
    hllReport(keys, hllRegisters(keys))
  }

  /** The HLL estimate read-off over an ALREADY-BUILT register frame
    * (bucket, m) — shared by the batch query and the streaming-
    * maintenance oracle query (q_hll_stream). Bucket-wise max-merge of
    * per-batch registers is EXACT (max is associative/commutative/
    * idempotent), so the streamed register table equals the one-shot
    * batch registers and both paths hash-match one oracle.
    */
  private[graft] def hllReport(keys: DataFrame, regs: DataFrame): DataFrame = {
    val agg = regs.agg(
      count(lit(1)).as("n_registers_used"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllMaxRho - m)")).as("s_present"))
    val truth = keys.agg(countDistinct(col("key")).as("true_distinct"))
    val withS = agg.crossJoin(truth).select(
      col("n_registers_used"),
      (col("s_present") +
        (lit(HllBuckets.toLong) - col("n_registers_used")) *
          lit(1L << HllMaxRho)).as("harmonic_scaled"),
      col("true_distinct"))
    val eRaw = lit(HllNumerator) / col("harmonic_scaled").cast("double")
    val v = lit(HllBuckets.toLong) - col("n_registers_used")
    val est = when(eRaw <= lit(2.5 * HllBuckets) && v > 0,
      lit(HllBuckets.toDouble) *
        log(lit(HllBuckets.toDouble) / v.cast("double")))
      .otherwise(eRaw)
    withS.select(
      col("n_registers_used"),
      col("harmonic_scaled"),
      graft.functions.F.roundHalfUp(est, 2).as("hll_estimate"),
      col("true_distinct"),
      graft.functions.F.roundHalfUp(
        abs(est - col("true_distinct").cast("double")) /
          col("true_distinct").cast("double"), 4).as("rel_error"))
  }

  /** Quantile-histogram geometry: [[QuantileBins]] equi-width bins over
    * the integer-cent domain; estimated percentiles [[QuantilePcts]]
    * (×100, so integer rank arithmetic stays exact).
    */
  val QuantileBins = 256
  val QuantilePcts: Seq[Int] = Seq(50, 90, 99)

  /** Fixed-bounds histogram cells of a long `c` column — the streaming
    * twin of [[quantileSketch]]'s pass 2: a stream cannot run the pass-1
    * min/max first, so bounds come from configuration and out-of-range
    * values clamp to the edge bins (standard streaming-histogram
    * behavior; the edge cells double as outlier counters). Cells merge
    * by addition, which is what StreamSketch.startHistogram exercises
    * across micro-batches.
    */
  private[graft] def centsHistogram(cents: DataFrame, lo: Long, hi: Long): DataFrame =
    cents.select(
      least(greatest(
        expr(s"(c - ${lo}L) * $QuantileBins DIV ${hi - lo + 1}L"), lit(0L)),
        lit((QuantileBins - 1).toLong)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))

  /** Fixed histogram bounds (integer cents) of the STREAMING quantile
    * maintenance path: a stream cannot run the batch min/max pass first,
    * so bounds are configuration. Sized to the lineitem price domain
    * (~901..105000 dollars at every SF) with the low edge INSIDE the
    * data range, so the q_histogram_stream row also proves the clamp
    * path: below-range cents land in edge bin 0, which doubles as the
    * outlier counter.
    */
  val StreamHistLoCents = 100000L
  val StreamHistHiCents = 10500000L

  /** Percentile read-off over an ALREADY-BUILT fixed-bounds histogram
    * cell frame (bin, cnt) — the streaming twin of [[quantileSketch]]'s
    * read-off, shared arithmetic, plus the same exact-rank truth
    * computed from the full `cents` frame for the hash-checked error
    * column. Cell addition is an exact merge, so the streamed histogram
    * equals the one-shot batch histogram over the same [lo, hi] and the
    * oracle replays it deterministically. Clamped edge bins interpolate
    * over their NOMINAL [bl, bh) span (the histogram cannot know how far
    * out-of-range its edge mass sits) — still deterministic, and the
    * honest fixed-bounds tradeoff the scaladoc'd est-vs-exact columns
    * surface.
    */
  private[graft] def histogramPercentiles(cents: DataFrame, cells: DataFrame,
      lo: Long, hi: Long): DataFrame = {
    import cents.sparkSession.implicits._
    val span = hi - lo + 1
    val hist = cells.select(col("bin"), col("cnt").cast("long").as("cnt"))
    val nRow = hist.agg(sum(col("cnt")).as("n"))
    val wb = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.select(col("bin"), col("cnt"),
      sum(col("cnt")).over(wb).as("cum"))
      .withColumn("cumb", col("cum") - col("cnt"))
    val targets = QuantilePcts.toDF("pct").crossJoin(broadcast(nRow))
      .select(col("pct"), col("n"), expr("(n * pct + 99) DIV 100").as("t"))
    val picked = targets.join(broadcast(cum), col("cum") >= col("t"))
      .groupBy("pct", "n", "t")
      .agg(min(col("bin")).as("bin"))
      .join(broadcast(cum), Seq("bin"))
    val est = picked
      .withColumn("bl", lit(lo) + expr(s"${span}L * bin DIV $QuantileBins"))
      .withColumn("bh", lit(lo) + expr(s"${span}L * (bin + 1) DIV $QuantileBins"))
      .withColumn("est_raw",
        (col("bl").cast("double") +
          (col("t") - col("cumb")).cast("double") / col("cnt").cast("double") *
            (col("bh") - col("bl")).cast("double")) / 100.0)
    val vw = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val valCum = cents.groupBy("c").agg(count(lit(1)).as("vcnt"))
      .select(col("c"), sum(col("vcnt")).over(vw).as("vcum"))
    val exact = targets.select(col("pct"), col("t"))
      .join(valCum, col("vcum") >= col("t"))
      .groupBy("pct").agg(min(col("c")).as("exact_cents"))
    val r = est.join(broadcast(exact), Seq("pct"))
      .withColumn("exact_price", col("exact_cents").cast("double") / 100.0)
      .select(col("pct"), col("t").as("target_rank"), col("n").as("n_rows"),
        graft.functions.F.roundHalfUp(col("est_raw"), 4).as("est_price"),
        col("exact_price"),
        graft.functions.F.roundHalfUp(abs(col("est_raw") - col("exact_price")), 4)
          .as("abs_err"))
    Out.sorted(r)(col("pct"))
  }

  /** Equi-width-histogram percentile sketch over lineitem prices — the
    * two-pass fixed-memory alternative to a global sort for quantiles
    * at 100 TB: pass 1 is a min/max agg (map-side combinable, two longs
    * per partition), pass 2 bins every row into [[QuantileBins]] cells
    * (one map-side-combinable groupBy; the histogram is 256 rows no
    * matter the input size, and two histograms over the same [lo, hi]
    * merge by plain cell addition). Percentile p is read off the
    * cumulative histogram with linear interpolation inside the first
    * bin whose cumulative count reaches rank ⌈p·n⌉ — the rank-t value
    * itself lies in that bin, so the estimate is within one bin width
    * of exact BY CONSTRUCTION (SketchesSpec pins the bound).
    *
    * Determinism: prices are fixed to integer CENTS (floor(x·100+0.5)),
    * bin indices/bounds and target ranks are pure integer arithmetic
    * (span·i DIV bins), and the only doubles are the final
    * interpolation — the same expression text the oracle replays. Two
    * stages are NOT sketch-scale and are verify-side only: the
    * cumulative read-off window (256 rows — trivial) and the exact
    * per-percentile truth, a cumulative count over DISTINCT cent values
    * in a single window partition — |distinct prices| rows, the same
    * exactness-for-comparison role as kmv's countDistinct, and exactly
    * the cost the sketch exists to avoid at scale.
    */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = Tables.load(spark, dir, "lineitem")
      .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c"))
    // eager: the 1-row min/max/count frame feeds three consumers (hist
    // binning, rank targets, exact lookup) — without it each broadcast
    // re-runs the pass-1 scan, tripling the table reads.
    val mm = Out.eager(cents.agg(min(col("c")).as("lo"), max(col("c")).as("hi"),
      count(lit(1)).as("n")))
    val hist = cents.crossJoin(broadcast(mm))
      .select(expr(s"(c - lo) * $QuantileBins DIV (hi - lo + 1)").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    val wb = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.select(col("bin"), col("cnt"),
      sum(col("cnt")).over(wb).as("cum"))
      .withColumn("cumb", col("cum") - col("cnt"))
    val targets = QuantilePcts.toDF("pct").crossJoin(broadcast(mm))
      .select(col("pct"), col("lo"), col("hi"), col("n"),
        expr("(n * pct + 99) DIV 100").as("t"))
    val picked = targets.join(broadcast(cum), col("cum") >= col("t"))
      .groupBy("pct", "lo", "hi", "n", "t")
      .agg(min(col("bin")).as("bin"))
      .join(broadcast(cum), Seq("bin"))
    val est = picked
      .withColumn("span", col("hi") - col("lo") + 1)
      .withColumn("bl", col("lo") + expr(s"span * bin DIV $QuantileBins"))
      .withColumn("bh", col("lo") + expr(s"span * (bin + 1) DIV $QuantileBins"))
      .withColumn("est_raw",
        (col("bl").cast("double") +
          (col("t") - col("cumb")).cast("double") / col("cnt").cast("double") *
            (col("bh") - col("bl")).cast("double")) / 100.0)
    val vw = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val valCum = cents.groupBy("c").agg(count(lit(1)).as("vcnt"))
      .select(col("c"), sum(col("vcnt")).over(vw).as("vcum"))
    val exact = targets.select(col("pct"), col("t"))
      .join(valCum, col("vcum") >= col("t"))
      .groupBy("pct").agg(min(col("c")).as("exact_cents"))
    val r = est.join(broadcast(exact), Seq("pct"))
      .withColumn("exact_price", col("exact_cents").cast("double") / 100.0)
      .select(col("pct"), col("t").as("target_rank"), col("n").as("n_rows"),
        graft.functions.F.roundHalfUp(col("est_raw"), 4).as("est_price"),
        col("exact_price"),
        graft.functions.F.roundHalfUp(abs(col("est_raw") - col("exact_price")), 4)
          .as("abs_err"))
    Out.sorted(r)(col("pct"))
  }

  /** Bloom geometry: [[BloomBits]]-bit array, [[BloomHashes]] probes —
    * sized for the demo dim; at scale both grow with the build side.
    */
  val BloomBits = 1024
  val BloomHashes = 3

  private def bloomPos(h: Column, j: Int): Column = {
    val (a, b) = cmsParams(j) // reuse the md5-derived pair family
    (lit(a) * h + lit(b)) % P % BloomBits
  }

  /** Set bit positions of a build-side `key` column — the Bloom filter
    * as a (tiny, ≤ BloomBits rows) distinct-position frame, broadcast
    * to probers. At scale this is the manual form of the runtime
    * bloom-filter pushdown: the fact side drops non-members BEFORE the
    * join shuffle, paying a broadcast of bits instead of a shuffle of
    * misses.
    */
  private[graft] def bloomBits(keys: DataFrame): DataFrame = {
    val h = keyHash(col("key"))
    keys.select(explode(array((0 until BloomHashes).map(bloomPos(h, _)): _*))
      .as("pos")).distinct()
  }

  /** Keep rows whose key passes the filter: a key is a candidate iff
    * ALL probe positions are set — one broadcast left-semi join per
    * hash, so the fact side is NEVER shuffled or exploded (the whole
    * point of a pre-filter). No false negatives — the law SketchesSpec
    * pins and q_bloom_join hash-checks end to end.
    */
  private[graft] def bloomFilter(fact: DataFrame, keyCol: String,
      bits: DataFrame): DataFrame = {
    val h = keyHash(col(keyCol))
    (0 until BloomHashes).foldLeft(fact) { (df, j) =>
      df.join(broadcast(bits.select(col("pos").as(s"_p$j"))),
        bloomPos(h, j) === col(s"_p$j"), "left_semi")
    }
  }

  /** Bloom-prefiltered semi-join of orders against one nation's
    * customers: the filter's selectivity and the no-false-negative law
    * in one hash-checked row (orders joined after the bloom pre-filter
    * MUST equal the plain join count; candidates in between measure the
    * false-positive cost actually paid).
    */
  def bloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val dim = Tables.load(spark, dir, "customer")
      .filter(col("c_nationkey") === 7)
      .select(col("c_custkey").as("key"))
    val bits = bloomBits(dim)
    val candidates = bloomFilter(orders, "o_custkey", bits)
    val plainCount = orders.join(dim, col("o_custkey") === col("key"), "left_semi")
      .agg(count(lit(1)).as("n_plain_join"))
    val candCount = candidates.agg(count(lit(1)).as("n_candidates"))
    val filteredJoin = candidates.join(dim, col("o_custkey") === col("key"), "left_semi")
      .agg(count(lit(1)).as("n_filtered_join"))
    val total = orders.agg(count(lit(1)).as("n_orders"))
    total.crossJoin(candCount).crossJoin(plainCount).crossJoin(filteredJoin)
      .select(col("n_orders"), col("n_candidates"), col("n_plain_join"),
        col("n_filtered_join"),
        (col("n_filtered_join") === col("n_plain_join")).as("no_false_negatives"))
  }

  /** CMS heavy-hitter check over lineitem part keys: build the sketch,
    * take the TRUE top-[[TopN]] parts, and re-estimate each through the
    * sketch. Output carries the per-key never-undercount invariant as a
    * boolean the correctness gate hashes.
    */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey").as("key"))
    cmsTopEstimates(keys, cmsCells(keys))
  }

  /** The heavy-hitter probe over an ALREADY-BUILT cell frame — shared by
    * the batch query and the streaming-maintenance oracle query
    * (q_cms_stream). Cell-wise addition is an exact merge, so the
    * streamed cells equal the one-shot batch sketch and both paths
    * hash-match one oracle.
    */
  private[graft] def cmsTopEstimates(keys: DataFrame, cells: DataFrame): DataFrame = {
    // orderBy+limit plans as TakeOrderedAndProject: per-partition partial
    // top-N, no single-partition global window
    val trueTop = keys.groupBy("key").agg(count(lit(1)).as("true_count"))
      .orderBy(desc("true_count"), asc("key")).limit(TopN)

    // probe: address one cell per hash row, estimate = min over rows
    val probes = trueTop
      .select(col("key"), col("true_count"),
        posexplode(array((0 until Depth).map(d => bucketOf(keyHash(col("key")), d)): _*))
          .as(Seq("d", "bucket")))
    val r = probes.join(broadcast(cells), Seq("d", "bucket"))
      .groupBy("key", "true_count")
      .agg(min(col("cnt")).as("cms_estimate"))
      .select(col("key"), col("true_count"), col("cms_estimate"),
        (col("cms_estimate") >= col("true_count")).as("never_undercounts"))
    Out.sorted(r)(desc("true_count"), col("key"))
  }
}
