package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** CMS heavy-hitter check over lineitem part keys: build the sketch,
    * take the TRUE top-[[TopN]] parts, and re-estimate each through the
    * sketch. Output carries the per-key never-undercount invariant as a
    * boolean the correctness gate hashes.
    */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey").as("key"))
    val h = keyHash(col("key"))

    val cells = cmsCells(keys)

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
