package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.LongType

import graft.operators.TextOps

/** Streaming near-duplicate detection — the continuous-ingest face of
  * the batch MinHash pipeline (TextOps.minhashNearDup): as documents
  * land, each is banded into its LSH buckets and compared (exact
  * Jaccard on shingle sets) against ONLY the documents already resident
  * in those buckets — never all-pairs, the same candidate-generation
  * contract as the batch plan, evaluated incrementally.
  *
  * Map side is the IDENTICAL arithmetic as the batch index (one md5
  * per shingle, k linear permutations mod 2^31-1, md5 band hashes), so
  * stream and batch agree on banding byte-for-byte. The stateful side
  * is a `flatMapGroupsWithState` keyed by (band_idx, band_hash):
  *
  *   - State per bucket = the (doc_id, shingle-set) list of residents,
  *     capped at [[TextOps.MaxBandFrequency]]: when a bucket exceeds
  *     the cap it flips to suppressed and CLEARS its resident list —
  *     the online form of the batch hot-band cap (the batch drops hot
  *     buckets retroactively; a stream cannot un-emit, so pairs found
  *     before the bucket went hot stand — the standard online/offline
  *     difference, pinned by StreamNearDupSpec). Suppressed buckets
  *     hold O(1) state, so boilerplate storms cannot grow memory.
  *   - Event-time timeout: a bucket idle past the watermark horizon is
  *     dropped entirely. Live state is therefore bounded by ACTIVE
  *     bucket cardinality × cap, regardless of stream length.
  *   - A pair sharing several bands emits once per shared band
  *     (at-least-once, like every ingest-side dedup signal here); the
  *     reader — or the end-of-day batch compactor — collapses them by
  *     (doc_a, doc_b). Within one bucket a pair emits exactly once.
  */
object StreamNearDup {

  val Watermark = "1 hour"

  /** One emitted candidate: a bucket-confirmed near-dup pair. */
  case class PairHit(doc_a: Long, doc_b: Long, jaccard: Double, band_idx: Int)

  /** Non-private: Catalyst's generated encoder projections cannot
    * access private classes. */
  case class BandKey(band_idx: Int, band_hash: String)
  case class BandedDoc(
      band_idx: Int, band_hash: String, doc_id: Long,
      ts: java.sql.Timestamp, shingles: Seq[String])
  case class BucketState(
      docs: List[(Long, Seq[String])], suppressed: Boolean)

  /** Per-row banding: shingles → numeric minhash signature → band rows.
    * Projection boundaries between the steps keep each lambda's input a
    * materialized attribute (see TextOps.shinglesOf's caveat).
    */
  private[streaming] def banded(docs: DataFrame): DataFrame = {
    val prime = TextOps.MinhashPrime
    val hs = transform(col("shingles"),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast(LongType) % prime)
    val mhCols = TextOps.minhashPerms.zipWithIndex.map { case ((a, b), p) =>
      array_min(transform(col("hs"), h => (lit(a) * h + lit(b)) % prime)).as(s"mh$p")
    }
    val r = TextOps.RowsPerBand
    val bandCols = (0 until TextOps.Bands).map { b =>
      md5(concat_ws("_",
        (0 until r).map(i => col(s"mh${b * r + i}").cast("string")): _*))
    }
    docs
      .select(col("doc_id"), col("ts"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), col("ts"), TextOps.shinglesOf(col("ws")).as("shingles"))
      .select(col("doc_id"), col("ts"), col("shingles"), hs.as("hs"))
      .select(Seq(col("doc_id"), col("ts"), col("shingles")) ++ mhCols: _*)
      .select(col("doc_id"), col("ts"), col("shingles"),
        posexplode_outer(array(bandCols: _*)).as(Seq("band_idx", "band_hash")))
  }

  private def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def bucketFn(
      key: BandKey, rows: Iterator[BandedDoc],
      state: GroupState[BucketState]): Iterator[PairHit] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var st = state.getOption.getOrElse(BucketState(Nil, suppressed = false))
    val out = Seq.newBuilder[PairHit]
    // deterministic in-batch order (the iterator's order is partition
    // internals, not data semantics)
    val batch = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
    for (d <- batch) {
      if (!st.suppressed) {
        if (st.docs.length >= TextOps.MaxBandFrequency) {
          st = BucketState(Nil, suppressed = true)
        } else {
          val dSet = d.shingles.toSet
          for ((pid, psh) <- st.docs if pid != d.doc_id) {
            val pSet = psh.toSet
            val inter = (dSet & pSet).size
            val union = (dSet | pSet).size
            val jac = rnd6(inter.toDouble / union)
            if (jac >= TextOps.JaccardThreshold)
              out += PairHit(math.min(pid, d.doc_id), math.max(pid, d.doc_id),
                jac, key.band_idx)
          }
          st = st.copy(docs = (d.doc_id, d.shingles) :: st.docs)
        }
      }
    }
    // ONE state write per (bucket, batch), not per row: the resident
    // list is O(cap·|shingles|) and the store serializes the whole
    // value on every update — a per-row update makes a busy bucket's
    // batch O(rows·cap) state bytes. The batch is sorted by ts, so the
    // last row's event time is the max — the same timeout the per-row
    // form ended on.
    if (batch.nonEmpty) {
      state.update(st)
      state.setTimeoutTimestamp(batch.last.ts.getTime, Watermark)
    }
    out.result().iterator
  }

  /** The shared transform: watermark → band → per-bucket incremental
    * candidate + confirm.
    */
  def pairs(docs: DataFrame): Dataset[PairHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    banded(docs.withWatermark("ts", Watermark))
      .as[BandedDoc]
      .groupByKey(d => BandKey(d.band_idx, d.band_hash))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(bucketFn)
  }

  /** Streaming job: NDJSON landing → near-dup pairs → append sink. */
  def start(spark: SparkSession, landingDir: String, outDir: String,
            checkpointDir: String): StreamingQuery = {
    StateStores.useRocksDb(spark)
    pairs(
      spark.readStream
        .schema(StreamDedup.docSchema)
        .option("maxFilesPerTrigger", 1)
        .json(landingDir))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("json")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
