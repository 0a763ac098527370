package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StateStores, StreamDedup}

/** The streaming jobs must actually RUN on the RocksDB state store —
  * not merely set a conf that something downstream overrides. A real
  * stateful stream is drained and its progress metrics are checked for
  * RocksDB-specific state-store counters (the provider's custom
  * metrics, absent under the default HDFS-backed provider).
  */
class StateStoresSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("stateful streams execute on the RocksDB provider (custom metrics present)") {
    val landing = Files.createTempDirectory("graft-ss-landing").toString
    val outDir = Files.createTempDirectory("graft-ss-out").toString
    val ckpt = Files.createTempDirectory("graft-ss-ckpt").toString
    Files.writeString(new java.io.File(landing, "d0.json").toPath,
      """{"doc_id":1,"ts":"2025-08-01T10:00:00.000Z","text":"a b c"}
        |{"doc_id":2,"ts":"2025-08-01T10:00:01.000Z","text":"a b c"}
        |{"doc_id":3,"ts":"2025-08-01T10:00:02.000Z","text":"x y z"}""".stripMargin)
    val q = StreamDedup.start(spark, landing, outDir, ckpt)
    q.awaitTermination(120000L)
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass") ===
      StateStores.RocksDbProvider)
    val ops = q.recentProgress.flatMap(_.stateOperators)
    assert(ops.nonEmpty, "stream reported no stateful operators")
    val metricKeys = ops.flatMap(_.customMetrics.keySet().toArray(Array.empty[String]))
    assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
      s"no rocksdb state-store metrics in progress (got: ${metricKeys.take(10).mkString(", ")})")
    // dedup semantics intact under the provider swap
    val streamed = spark.read
      .schema("bow_hash STRING, doc_id LONG, ts TIMESTAMP")
      .json(outDir).select("bow_hash").collect()
    assert(streamed.map(_.getString(0)).distinct.length === 2)
  }
}
