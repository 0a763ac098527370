package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store configuration shared by every streaming job start.
  *
  * All stateful streams in the engine (watch-window ring buffers, dedup
  * key sets, near-dup band buckets, sketch registers, sessionization,
  * CDC fold, stream-stream join buffers) run on the RocksDB state store
  * provider rather than the default HDFS-backed in-memory map: at the
  * key cardinalities a 100-TB deployment carries (one entry per SKU /
  * dedup key / band bucket), per-key state must spill to executor-local
  * disk instead of competing with execution memory on-heap — RocksDB is
  * Spark's deployable answer (native LSM store, bounded heap via block
  * cache, incremental checkpointing). Changelog checkpointing is on:
  * per-batch checkpoint cost becomes O(delta), not O(snapshot) — the
  * difference between a streaming job that keeps up and one that falls
  * behind as state grows.
  *
  * Correctness is provider-independent — the stream==batch oracle rows
  * (q_watch_stream, q_dedup_stream, q_cdc_stream, …) and every
  * streaming spec run through this helper, so the whole streaming gate
  * re-proves the contracts under RocksDB on every run.
  */
object StateStores {

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Flip the session to RocksDB state stores (idempotent; streaming
    * queries capture the conf at `start()`).
    */
  def useRocksDb(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    // Observability-only row counting: every put/remove pays a point
    // lookup just to keep the numRowsTotal METRIC exact. Spark's own
    // tuning guide lists turning it off as the first RocksDB knob for
    // update-heavy workloads; no query result depends on the metric.
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows",
      "false")
  }

  /** Landed-input bytes per state partition the sizing rule assumes.
    * 32 MB of NDJSON landing keeps a partition's per-batch state work
    * comfortably under a task's memory budget while the partition
    * count stays proportional to volume.
    */
  val BytesPerStatePartition: Long = 32L * 1024 * 1024

  /** Hard ceiling on DERIVED state partitions (override
    * `graft.stream.statePartitions` wins outright): state partitions
    * are frozen into a checkpoint for its lifetime, so production
    * deployments over-provision but not unboundedly — 4096 partitions
    * at 32 MB/partition sizes a ~128 GB-per-cycle landing; past that,
    * raise the explicit conf at deploy time.
    */
  val MaxDerivedStatePartitions = 4096

  /** Total bytes under the given landing paths (driver-side metadata
    * listing, zero Spark jobs — the ParquetMeta discipline).
    */
  def landedBytes(spark: SparkSession, paths: String*): Long =
    paths.map { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) fs.getContentSummary(hp).getLength else 0L
    }.sum

  /** SCALE-ADAPTIVE state partition count for a streaming drain —
    * guide §2: derive partitioning from input size instead of pinning
    * a constant tuned for either local mode or one cluster.
    *
    * A stateful streaming query freezes `spark.sql.shuffle.partitions`
    * into its checkpoint as the state-store count, and every
    * micro-batch then pays per-partition fixed machinery (a state
    * store open/commit/changelog per operator per partition per
    * trigger) regardless of how many rows flow. Sizing that count to
    * the CORES (the batch default) makes a small topic pay ~cores ×
    * stores × trigger fixed costs for no parallelism gain, while any
    * fixed count chokes at warehouse volume. The rule here is the one
    * production uses for topic sizing: partitions ∝ landed volume
    * ([[BytesPerStatePartition]]), floor 1, ceiling
    * [[MaxDerivedStatePartitions]], explicit override
    * `graft.stream.statePartitions` for deployments that know their
    * state better than their landing (e.g. high-cardinality state fed
    * by a narrow stream).
    */
  def statePartitionsFor(spark: SparkSession, inputBytes: Long): Int =
    spark.conf.getOption("graft.stream.statePartitions")
      .map(_.toInt)
      .getOrElse {
        val derived =
          (inputBytes + BytesPerStatePartition - 1) / BytesPerStatePartition
        derived.max(1L).min(MaxDerivedStatePartitions.toLong).toInt
      }

  /** Run `body` (a stream start + drain) with
    * `spark.sql.shuffle.partitions` set from the landing size, restoring
    * the session's batch setting afterwards. Streaming queries capture
    * the conf when they start, and foreachBatch bodies run on the
    * stream's cloned session, so the narrowed setting covers exactly
    * the drain; batch read-offs after the drain see the session value
    * again. Correctness is partition-count-independent by the streaming
    * determinism contracts (every stateful fold sorts within its key
    * group; sketch merges are order-free laws) — re-proven by the
    * stream rows' oracle gate under any partitioning.
    */
  def withStatePartitions[T](spark: SparkSession, inputBytes: Long)(
      body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, statePartitionsFor(spark, inputBytes).toString)
    try body finally spark.conf.set(key, prev)
  }
}
