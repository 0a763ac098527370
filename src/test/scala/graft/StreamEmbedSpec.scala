package graft

import java.nio.file.Files
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamEmbed
import graft.operators.VectorOps

/** Streaming embedding LSH admission (multi-probe buckets in
  * flatMapGroupsWithState): the pair set the stream confirms must equal
  * the batch multi-probe pair chain at pinned NPlanes over identical
  * input — independent of arrival order and micro-batch boundaries —
  * with identical rounded cosines. The online resident cap must
  * suppress (and shed the state of) buckets that exceed
  * MaxBucketResidents.
  */
class StreamEmbedSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    .withZone(ZoneOffset.UTC)

  private def line(vecId: Long, minute: Int, emb: Array[Double]): String = {
    val ts = fmt.format(java.time.Instant.parse("2025-08-01T10:00:00Z")
      .plusSeconds(minute * 60L))
    s"""{"vec_id":$vecId,"ts":"$ts","embedding":[${emb.mkString(",")}]}"""
  }

  private def runStream(chunks: Seq[Seq[String]]): Seq[(Long, Long, Double)] = {
    val landing = Files.createTempDirectory("graft-semb-landing").toString
    val outDir = Files.createTempDirectory("graft-semb-out").toString
    val ckpt = Files.createTempDirectory("graft-semb-ckpt").toString
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val f = new java.io.File(landing, s"vecs_$i.json")
      Files.writeString(f.toPath, chunk.mkString("\n"))
      assert(f.setLastModified(1700000000000L + i * 60000L))
    }
    val q = StreamEmbed.start(spark, landing, outDir, ckpt)
    assert(q.awaitTermination(180000L), "stream did not finish")
    spark.read
      .schema("vec_a LONG, vec_b LONG, cos_sim DOUBLE")
      .json(outDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  test("streamed pairs == batch multi-probe pairs, order-independent") {
    val vecs = Tables.load(spark, SparkT.Sf0001, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("emb"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Double]]("emb").toArray))
    // round-robin chunks: arrival order deliberately != id order, and
    // qualifying pairs get split across micro-batches both ways
    val chunks = (0 until 3).map(c =>
      vecs.zipWithIndex.filter(_._2 % 3 == c)
        .map { case ((id, emb), _) => line(id, c, emb) }.toSeq)
    val streamed = runStream(chunks)
    // each pair emits exactly once (home/probe split, not per-probe)
    assert(streamed.map(p => (p._1, p._2)).distinct.length === streamed.length)

    val batch = VectorOps
      .embedNearDupCandidates(spark, SparkT.Sf0001, VectorOps.NPlanes)
      .filter(col("cos_sim") >= VectorOps.NearDupCosine)
      .collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cos_sim"))).toSet
    assert(batch.nonEmpty)
    assert(streamed.toSet == batch,
      s"stream-only: ${streamed.toSet -- batch}; batch-only: ${batch -- streamed.toSet}")
  }

  test("online resident cap: pairs stop once a bucket exceeds the cap") {
    val cap = StreamEmbed.MaxBucketResidents
    val unit = Array.fill(64)(0.125) // unit-norm: 64 * 0.125^2 = 1
    // cap + 10 identical vectors arriving in id order: all land in one
    // home bucket, which crosses the cap at arrival #cap+1 and must
    // emit nothing from then on (state shed, suppressed flag set)
    val clones = (1 to cap + 10).map(i => line(1000L + i, i, unit))
    val streamed = runStream(Seq(clones))
    // pairs only among the first `cap` residents
    assert(streamed.nonEmpty)
    assert(streamed.forall { case (a, b, _) =>
      a <= 1000L + cap && b <= 1000L + cap })
    // identical unit vectors: cosine exactly 1.0 everywhere
    assert(streamed.forall(_._3 === 1.0))
    // every pre-cap pair emitted exactly once
    assert(streamed.length === cap * (cap - 1) / 2)
  }

  test("restart contract: changed knobs fail fast; same knobs restore cleanly") {
    val landing = Files.createTempDirectory("graft-semb-rst-landing").toString
    val outDir = Files.createTempDirectory("graft-semb-rst-out").toString
    val ckpt = Files.createTempDirectory("graft-semb-rst-ckpt").toString
    val unit = Array.fill(64)(0.125)
    Files.writeString(new java.io.File(landing, "vecs_0.json").toPath,
      (1 to 3).map(i => line(i.toLong, i, unit)).mkString("\n"))
    val q1 = StreamEmbed.start(spark, landing, outDir, ckpt)
    assert(q1.awaitTermination(180000L), "first run did not finish")

    // a restart under a DIFFERENT derived plane count must be a clear
    // error naming the stored knobs — never wrong (silently thinner)
    // pairs from mixed bucketings
    val e = intercept[IllegalStateException] {
      StreamEmbed.start(spark, landing, outDir, ckpt,
        nPlanes = VectorOps.NPlanesWide)
    }
    assert(e.getMessage.contains("knobs"))
    assert(e.getMessage.contains(s""""n_planes":${VectorOps.NPlanes}"""))

    // ...and so must a changed resident cap
    intercept[IllegalStateException] {
      StreamEmbed.start(spark, landing, outDir, ckpt,
        maxResidents = StreamEmbed.CappedResidents)
    }

    // same knobs: restores and picks up new arrivals exactly once
    Files.writeString(new java.io.File(landing, "vecs_1.json").toPath,
      Seq(line(4L, 4, unit)).mkString("\n"))
    val q2 = StreamEmbed.start(spark, landing, outDir, ckpt)
    assert(q2.awaitTermination(180000L), "restart did not finish")
    val streamed = spark.read
      .schema("vec_a LONG, vec_b LONG, cos_sim DOUBLE")
      .json(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 4 clones in one bucket: all 6 pairs, each exactly once — the
    // restored residents met the new arrival, nothing re-emitted
    assert(streamed.distinct.length === streamed.length)
    assert(streamed.toSet === (1 to 4).combinations(2)
      .map(c => (c(0).toLong, c(1).toLong)).toSet)
  }
}
