package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps
import graft.streaming.AnnIngest

/** The STREAMING scheduler contract for persisted-index maintenance
  * (AnnIngest): driving the add/compact verbs from Structured
  * Streaming must (a) change nothing about the rows — streamed
  * ingest-then-search is row-identical to the chained batch adds —
  * (b) stay a pure stored-quantizer path (zero Lloyd iterations
  * across every admission and fold), (c) actually trip compaction at
  * the threshold so the scan count stays bounded, and (d) survive a
  * mid-stream restart: the checkpoint admits only unseen batches, so
  * no vector is ever encoded into the index twice.
  */
class AnnIngestStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark
  private val dir = SparkT.Sf0001

  private def residueOf(c: org.apache.spark.sql.Column) =
    c % VectorOps.AddModulus

  private def corpus = VectorOps.embDistributed(spark, dir)

  private def baseCorpus = corpus.filter(
    !residueOf(col("vec_id"))
      .isin(VectorOps.AddResidue, VectorOps.AddResidue2))

  private def landBatch(residue: Long, landing: String): Unit =
    corpus.filter(residueOf(col("vec_id")) === residue)
      .coalesce(1).write.mode("append").parquet(landing)

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    assert(q.awaitTermination(300000L), "ingest stream did not finish")

  test("streamed ingest == chained batch adds (the chain law under the streaming scheduler)") {
    val streamed = AnnIngest.annIngestStream(spark, dir)
      .collect().map(_.toSeq).toSet
    val viaChain = VectorOps.ivfPqIndexAddChain(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed === viaChain)
  }

  test("admissions + fold compose ZERO Lloyd iterations; the threshold trips compaction") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_annin_meter").toString
    val base = s"$tmp/index"
    VectorOps.ivfPqPersistFrames(spark, baseCorpus, baseCorpus, base)
    landBatch(VectorOps.AddResidue, s"$tmp/landing")
    landBatch(VectorOps.AddResidue2, s"$tmp/landing")
    VectorOps.LloydMeter.reset()
    drain(AnnIngest.start(spark, s"$tmp/landing", base, s"$tmp/ckpt"))
    assert(VectorOps.LloydMeter.iterations.get() === 0L,
      "a streamed admission or fold re-trained a quantizer")
    assert(VectorOps.committedDeltas(spark, base, AnnIngest.DeltaPrefix)
      .isEmpty, "compaction did not trip at the delta threshold")
    val n = corpus.count()
    val listed = spark.read.parquet(s"$base/lists").count()
    assert(listed === n * VectorOps.PqSubspaces,
      s"folded lists carry $listed code rows for $n vectors")
  }

  test("crash window: a batch FOLDED by compaction before the checkpoint committed is skipped on replay") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_annin_fold").toString
    val base = s"$tmp/index"
    VectorOps.ivfPqPersistFrames(spark, baseCorpus, baseCorpus, base)
    landBatch(VectorOps.AddResidue, s"$tmp/landing")
    landBatch(VectorOps.AddResidue2, s"$tmp/landing")
    drain(AnnIngest.start(spark, s"$tmp/landing", base, s"$tmp/ckpt"))
    assert(VectorOps.committedDeltas(spark, base, AnnIngest.DeltaPrefix)
      .isEmpty, "precondition: the threshold compaction folded both deltas")
    val lists = spark.read.parquet(s"$base/lists").select("vec_id", "sub")
    val before = lists.count()
    // the crash window the checkpoint cannot cover: the JVM died after
    // the in-batch compaction swap committed but before the stream
    // checkpoint recorded micro-batch 1's offset — the restarted stream
    // re-delivers batch 1 (and, with a wiped checkpoint, batch 0 too)
    def replay(residue: Long, batchId: Long): Unit =
      AnnIngest.admit(spark, s"$tmp/landing", base,
        corpus.filter(residueOf(col("vec_id")) === residue),
        batchId, AnnIngest.CompactEvery)
    replay(VectorOps.AddResidue2, 1L)
    replay(VectorOps.AddResidue, 0L)
    assert(VectorOps.committedDeltas(spark, base, AnnIngest.DeltaPrefix)
      .isEmpty, "a folded batch was re-admitted as a delta")
    val after = spark.read.parquet(s"$base/lists").select("vec_id", "sub")
    assert(after.count() === before,
      "replaying a folded batch changed the merged lists")
    assert(after.distinct().count() === before,
      "a replayed batch duplicated (vec_id, sub) code rows")
    // a genuinely NEW batch id (above the watermark) still admits
    AnnIngest.admit(spark, s"$tmp/landing", base,
      corpus.filter(residueOf(col("vec_id")) === VectorOps.AddResidue)
        .limit(0),
      2L, compactEvery = 99)
    assert(VectorOps.foldedWatermark(spark, base) === 1L,
      "the watermark moved without a compaction")
  }

  test("mid-stream restart admits only unseen batches — nothing is encoded twice") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_annin_restart").toString
    val base = s"$tmp/index"
    VectorOps.ivfPqPersistFrames(spark, baseCorpus, baseCorpus, base)
    // threshold 3 never trips here: the deltas stay visible, so the
    // union search path and the per-batch tables are themselves pinned
    landBatch(VectorOps.AddResidue, s"$tmp/landing")
    drain(AnnIngest.start(spark, s"$tmp/landing", base, s"$tmp/ckpt",
      compactEvery = 3))
    val afterFirst =
      VectorOps.committedDeltas(spark, base, AnnIngest.DeltaPrefix)
    assert(afterFirst.size === 1, s"expected one delta, got $afterFirst")
    landBatch(VectorOps.AddResidue2, s"$tmp/landing")
    drain(AnnIngest.start(spark, s"$tmp/landing", base, s"$tmp/ckpt",
      compactEvery = 3))
    val deltas =
      VectorOps.committedDeltas(spark, base, AnnIngest.DeltaPrefix)
    assert(deltas.size === 2,
      s"restart re-admitted or dropped a batch: $deltas")
    // every (vec_id, sub) code row exists EXACTLY once across the layout
    val all = ("lists" +: deltas)
      .map(t => spark.read.parquet(s"$base/$t").select("vec_id", "sub"))
      .reduce(_ unionByName _)
    assert(all.count() === all.distinct().count(),
      "a replayed batch duplicated code rows")
    assert(all.count() === corpus.count() * VectorOps.PqSubspaces)
    val got = VectorOps.searchStored(spark, dir, base, deltas)
      .filter(col("rank") <= VectorOps.TopKPq)
      .select("q_id", "cell", "cell_sim", "rank", "neighbor_id",
        "approx_sim")
      .collect().map(_.toSeq).toSet
    val viaChain = VectorOps.ivfPqIndexAddChain(spark, dir)
      .select("q_id", "cell", "cell_sim", "rank", "neighbor_id",
        "approx_sim")
      .collect().map(_.toSeq).toSet
    assert(got === viaChain)
  }

  test("a WIPED checkpoint against a folded index fails loudly instead of dropping batches") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_annin_wiped").toString
    val base = s"$tmp/index"
    VectorOps.ivfPqPersistFrames(spark, baseCorpus, baseCorpus, base)
    landBatch(VectorOps.AddResidue, s"$tmp/landing")
    landBatch(VectorOps.AddResidue2, s"$tmp/landing")
    drain(AnnIngest.start(spark, s"$tmp/landing", base, s"$tmp/ckpt"))
    assert(VectorOps.foldedWatermark(spark, base) >= 0L,
      "precondition: the threshold compaction advanced the watermark")
    // the data-loss hazard: checkpoint wiped, index (and its positive
    // watermark) retained — the fresh stream restarts at batch id 0,
    // which the watermark skip would silently drop
    val ckptPath = new org.apache.hadoop.fs.Path(s"$tmp/ckpt")
    val fs = ckptPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(ckptPath, true))
    // a genuinely NEW batch (shifted ids — nothing the index holds)
    corpus.filter(residueOf(col("vec_id")) === VectorOps.AddResidue)
      .withColumn("vec_id", col("vec_id") + 10000000L)
      .coalesce(1).write.mode("append").parquet(s"$tmp/landing2")
    val q = AnnIngest.start(spark, s"$tmp/landing2", base, s"$tmp/ckpt")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(300000L)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("folded-batch watermark")),
      s"expected the identity guard, got: ${messages(e).mkString(" | ")}")
    // nothing was admitted or skipped silently: the index layout is
    // untouched (both original batches folded, no new delta)
    assert(VectorOps.committedDeltas(spark, base, AnnIngest.DeltaPrefix)
      .isEmpty)
    // restoring ingest is an explicit operator action: wiping the
    // index's stream markers lets a fresh checkpoint take over
    Seq("_folded_watermark.json", "_stream_identity.json").foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(base, n), false))
    drain(AnnIngest.start(spark, s"$tmp/landing2", base, s"$tmp/ckpt2"))
    assert(VectorOps.committedDeltas(spark, base, AnnIngest.DeltaPrefix)
      .size === 1, "the explicitly reset index re-admits fresh batches")
  }

  test("a MISSING identity stamp does not soften the guard: positive watermark + absent stamp fails loudly") {
    // pre-stamp legacy index, manual marker cleanup, or a crash inside
    // the stamp replacement: from the guard's view all three are a
    // positive watermark with no attributable stream — adopting a new
    // checkpoint there reopens the silent-drop window, so takeover
    // must require the operator to clear _folded_watermark explicitly
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_annin_nostamp").toString
    val base = s"$tmp/index"
    VectorOps.ivfPqPersistFrames(spark, baseCorpus, baseCorpus, base)
    landBatch(VectorOps.AddResidue, s"$tmp/landing")
    landBatch(VectorOps.AddResidue2, s"$tmp/landing")
    drain(AnnIngest.start(spark, s"$tmp/landing", base, s"$tmp/ckpt"))
    assert(VectorOps.foldedWatermark(spark, base) >= 0L)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(base, "_stream_identity.json"), false))
    val q = AnnIngest.start(spark, s"$tmp/landing", base, s"$tmp/ckpt2")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(300000L)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
        m.contains("folded-batch") || m.contains("no identity stamp")),
      s"expected the identity guard, got: ${messages(e).mkString(" | ")}")
  }

  test("wiped checkpoint BEFORE first compaction (watermark < 0): takeover re-admits via idempotent same-name overwrites, no duplicate codes") {
    // the watermark can drop nothing, so a fresh checkpoint takes over
    // the stamp; its restarted batch ids re-commit the SAME delta names
    // ivfPqAddBatch already wrote — idempotent overwrite, not duplication
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_annin_prefold").toString
    val base = s"$tmp/index"
    VectorOps.ivfPqPersistFrames(spark, baseCorpus, baseCorpus, base)
    landBatch(VectorOps.AddResidue, s"$tmp/landing")
    drain(AnnIngest.start(spark, s"$tmp/landing", base, s"$tmp/ckpt",
      compactEvery = 99))
    assert(VectorOps.foldedWatermark(spark, base) === -1L,
      "precondition: nothing folded before the wipe")
    val deltas0 =
      VectorOps.committedDeltas(spark, base, AnnIngest.DeltaPrefix)
    assert(deltas0.size === 1)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/ckpt"), true))
    // fresh checkpoint over the SAME landing dir: batch 0 re-delivers
    drain(AnnIngest.start(spark, s"$tmp/landing", base, s"$tmp/ckpt2",
      compactEvery = 99))
    val deltas =
      VectorOps.committedDeltas(spark, base, AnnIngest.DeltaPrefix)
    assert(deltas === deltas0,
      s"re-admission changed the delta set: $deltas0 -> $deltas")
    val codes = spark.read.parquet(s"$base/${deltas.head}")
      .select("vec_id", "sub")
    assert(codes.count() === codes.distinct().count(),
      "re-admission duplicated (vec_id, sub) code rows")
    assert(codes.count() ===
      corpus.filter(residueOf(col("vec_id")) === VectorOps.AddResidue)
        .count() * VectorOps.PqSubspaces)
  }
}
