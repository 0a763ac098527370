package graft

import java.nio.file.Files
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup

/** Streaming exact dedup (dropDuplicatesWithinWatermark on the shared
  * bow_hash key): streamed first-seen set must equal the batch dedup's
  * canonical group set over identical input, with zero duplicate
  * emissions — including across micro-batches (re-sent documents in a
  * later file are suppressed by key state within the watermark).
  */
class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("streamed dedup == batch canonical set; re-sent docs suppressed") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-sd-landing").toString
    val outDir = Files.createTempDirectory("graft-sd-out").toString
    val ckpt = Files.createTempDirectory("graft-sd-ckpt").toString

    val docs = Tables.load(spark, SparkT.Sf0001, "documents")
      .select(col("doc_id").cast("long"), col("text")).orderBy("doc_id").collect()
    val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      .withZone(ZoneOffset.UTC)
    def line(docId: Long, minute: Int, text: String): String = {
      val ts = fmt.format(java.time.Instant.parse("2025-08-01T10:00:00Z")
        .plusSeconds(minute * 60L))
      s"""{"doc_id":$docId,"ts":"$ts","text":${escape(text)}}"""
    }
    val chunks = docs.grouped(math.max(1, docs.length / 3 + 1)).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val lines = chunk.map(r => line(r.getLong(0), i, r.getString(1)))
      val f = new java.io.File(landing, s"docs_$i.json")
      Files.writeString(f.toPath, lines.mkString("\n"))
      assert(f.setLastModified(1700000000000L + i * 60000L))
    }
    // a final file re-sending the first chunk under fresh doc_ids: every
    // line is a within-watermark duplicate and must be suppressed
    val resent = chunks.head.map(r =>
      line(r.getLong(0) + 1000000L, chunks.size, r.getString(1)))
    val f = new java.io.File(landing, s"docs_${chunks.size}.json")
    Files.writeString(f.toPath, resent.mkString("\n"))
    assert(f.setLastModified(1700000000000L + chunks.size * 60000L))

    val q = StreamDedup.start(spark, landing, outDir, ckpt)
    q.awaitTermination(120000L)

    val streamed = spark.read
      .schema("bow_hash STRING, doc_id LONG, ts TIMESTAMP")
      .json(outDir)
      .select("bow_hash", "doc_id").collect()

    // zero duplicate emissions
    assert(streamed.map(_.getString(0)).distinct.length == streamed.length)
    // no re-sent doc_id came through
    assert(streamed.forall(_.getLong(1) < 1000000L))
    // streamed key set == batch canonical key set on the same corpus
    val batchKeys = Tables.load(spark, SparkT.Sf0001, "documents")
      .select(graft.operators.TextOps.bowHash.as("bow_hash"))
      .distinct().as[String].collect().toSet
    assert(streamed.map(_.getString(0)).toSet == batchKeys)
  }

  private def escape(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
}
