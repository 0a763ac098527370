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
  }
}
