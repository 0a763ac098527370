package graft

import java.nio.file.Files
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamNearDup
import graft.operators.TextOps

/** Streaming MinHash near-dup (banded buckets in flatMapGroupsWithState):
  * the pair set the stream confirms — collapsed by (doc_a, doc_b), since
  * a pair emits once per shared band — must equal the batch MinHash
  * pipeline's confirmed pairs over identical input, with identical
  * Jaccard values. The online hot-bucket cap must suppress (and shed the
  * state of) buckets that exceed MaxBandFrequency.
  */
class StreamNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    .withZone(ZoneOffset.UTC)

  private def line(docId: Long, minute: Int, text: String): String = {
    val ts = fmt.format(java.time.Instant.parse("2025-08-01T10:00:00Z")
      .plusSeconds(minute * 60L))
    s"""{"doc_id":$docId,"ts":"$ts","text":${escape(text)}}"""
  }

  private def runStream(lines: Seq[Seq[String]]): Seq[(Long, Long, Double)] = {
    val landing = Files.createTempDirectory("graft-snd-landing").toString
    val outDir = Files.createTempDirectory("graft-snd-out").toString
    val ckpt = Files.createTempDirectory("graft-snd-ckpt").toString
    lines.zipWithIndex.foreach { case (chunk, i) =>
      val f = new java.io.File(landing, s"docs_$i.json")
      Files.writeString(f.toPath, chunk.mkString("\n"))
      assert(f.setLastModified(1700000000000L + i * 60000L))
    }
    val q = StreamNearDup.start(spark, landing, outDir, ckpt)
    assert(q.awaitTermination(180000L), "stream did not finish")
    spark.read
      .schema("doc_a LONG, doc_b LONG, jaccard DOUBLE, band_idx INT")
      .json(outDir)
      .select("doc_a", "doc_b", "jaccard")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  test("streamed pairs (collapsed across bands) == batch MinHash pairs") {
    val docs = Tables.load(spark, SparkT.Sf0001, "documents")
      .select(col("doc_id").cast("long"), col("text")).orderBy("doc_id").collect()
    val chunks = docs.grouped(math.max(1, docs.length / 3 + 1)).zipWithIndex.map {
      case (chunk, i) => chunk.toSeq.map(r => line(r.getLong(0), i, r.getString(1)))
    }.toSeq
    val streamed = runStream(chunks).toSet

    import spark.implicits._
    val batch = TextOps.nearDupPairsFrom(
      docs.toSeq.map(r => (r.getLong(0), r.getString(1))).toDF("doc_id", "text"))
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
  }

  test("online hot-bucket cap: pairs stop once a bucket exceeds the cap") {
    val cap = TextOps.MaxBandFrequency
    val cloneText = "alpha beta gamma delta epsilon zeta eta theta"
    // cap + 10 identical docs arriving in id order: every clone shares
    // every band bucket, so each of its 8 buckets crosses the cap at
    // doc #cap+1 and must emit nothing from then on
    val clones = (1 to cap + 10).map(i => line(100L + i, i, cloneText))
    val streamed = runStream(Seq(clones))
    val perPair = streamed.groupBy(p => (p._1, p._2))
    // pairs only among the first `cap` residents
    assert(perPair.keys.forall { case (a, b) => a <= 100L + cap && b <= 100L + cap })
    // identical docs: jaccard exactly 1.0 everywhere
    assert(streamed.forall(_._3 == 1.0))
    // the pre-cap residents pair fully: cap*(cap-1)/2 distinct pairs
    assert(perPair.size == cap * (cap - 1) / 2)
  }

  private def escape(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
}
