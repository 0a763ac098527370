package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** The tombstone-DELETE contract of the persisted IVF-PQ index — the
  * faiss remove_ids verb, LSM-style: (a) the mask law — delete-then-
  * search is row-identical to a one-shot index that trains on the full
  * corpus but encodes only the survivors (the add law mirrored);
  * (b) the purge law — the next compaction drops tombstoned rows from
  * the physical rewrite, retires the tombstone table, composes zero
  * Lloyd iterations, and the maskless post-purge search is identical
  * to the masked pre-purge one; (c) idempotence — re-admitting a
  * delete batch, deleting never-indexed ids, and re-compacting after
  * the purge are all no-ops.
  */
class IvfPqDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark
  private val dir = SparkT.Sf0001

  private def residueOf(c: org.apache.spark.sql.Column) =
    c % VectorOps.AddModulus

  private def corpus = VectorOps.embDistributed(spark, dir)

  private def deadIds = corpus
    .filter(residueOf(col("vec_id")) === VectorOps.DeleteResidue)
    .select(col("vec_id"))

  private def freshBase(tag: String): String = {
    val base = java.nio.file.Files
      .createTempDirectory(s"graft_ivfpq_$tag").toString
    VectorOps.ivfPqPersistFrames(spark, corpus, corpus, base)
    base
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .filter(col("rank") <= VectorOps.TopKPq)
    .select("q_id", "cell", "cell_sim", "rank", "neighbor_id", "approx_sim")
    .collect().map(_.toSeq).toSet

  test("delete-then-search == one-shot encode-all-EXCEPT-deleted (the add law mirrored)") {
    val viaDelete = VectorOps.ivfPqIndexDelete(spark, dir)
      .collect().map(_.toSeq).toSet
    val oneShot = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_delref").toString
    VectorOps.ivfPqPersistFrames(spark, corpus,
      corpus.filter(residueOf(col("vec_id")) =!= VectorOps.DeleteResidue),
      oneShot)
    val viaHoldout = rows(VectorOps.searchStored(spark, dir, oneShot, Nil))
    assert(viaDelete.nonEmpty)
    assert(viaDelete === viaHoldout)
    // the retraction is visible: no tombstoned id survives as neighbor
    assert(!viaDelete.exists(r => r(4).asInstanceOf[Long] %
      VectorOps.AddModulus == VectorOps.DeleteResidue))
  }

  test("compaction PURGES: rows dropped physically, tombstones retired, zero Lloyd, search unchanged") {
    val base = freshBase("purge")
    VectorOps.ivfPqDelete(spark, base, deadIds)
    val masked = rows(VectorOps.searchStored(spark, dir, base, Nil))
    VectorOps.LloydMeter.reset()
    VectorOps.ivfPqCompact(spark, base, Nil)
    assert(VectorOps.LloydMeter.iterations.get() === 0L,
      "the purge rewrite re-trained a quantizer")
    assert(!new java.io.File(s"$base/${VectorOps.DeletesTable}").exists(),
      "tombstone table survived the purge")
    val left = spark.read.parquet(s"$base/lists")
      .filter(residueOf(col("vec_id")) === VectorOps.DeleteResidue).count()
    assert(left === 0L, s"$left tombstoned code rows survived physically")
    assert(rows(VectorOps.searchStored(spark, dir, base, Nil)) === masked,
      "maskless post-purge search diverged from the masked one")
    // nothing pending: re-compacting is a no-op that never rewrites
    val listing = new java.io.File(s"$base/lists").listFiles()
      .map(f => (f.getPath, f.lastModified)).toSet
    VectorOps.ivfPqCompact(spark, base, Nil)
    assert(new java.io.File(s"$base/lists").listFiles()
      .map(f => (f.getPath, f.lastModified)).toSet === listing,
      "a purge-less re-compact rewrote the lists")
  }

  test("re-deleting the same batch and deleting never-indexed ids are no-ops") {
    val base = freshBase("idem")
    VectorOps.ivfPqDelete(spark, base, deadIds)
    val once = rows(VectorOps.searchStored(spark, dir, base, Nil))
    VectorOps.ivfPqDelete(spark, base, deadIds)
    import spark.implicits._
    VectorOps.ivfPqDelete(spark, base,
      Seq(java.lang.Long.MAX_VALUE - 1, java.lang.Long.MAX_VALUE - 2)
        .toDF("vec_id"))
    assert(rows(VectorOps.searchStored(spark, dir, base, Nil)) === once)
  }

  test("delete composes with pending ADD deltas: the mask covers every scanned table") {
    val held = corpus
      .filter(residueOf(col("vec_id")) =!= VectorOps.AddResidue)
    val base = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_deladd").toString
    VectorOps.ivfPqPersistFrames(spark, held, held, base)
    VectorOps.ivfPqAddBatch(spark, dir, base,
      corpus.filter(residueOf(col("vec_id")) === VectorOps.AddResidue),
      "lists_delta")
    // retract ids from BOTH the base lists and the arriving batch: every
    // other vector of the delta (vec_id ≡ AddResidue mod 2·AddModulus)
    // is tombstoned too, so the mask over the DELTA scan is exercised,
    // not just the base-lists one
    val deadDelta = corpus
      .filter(residueOf(col("vec_id")) === VectorOps.AddResidue &&
        col("vec_id") % (VectorOps.AddModulus * 2) === VectorOps.AddResidue)
      .select(col("vec_id"))
    val deadDeltaIds = deadDelta.collect().map(_.getLong(0)).toSet
    assert(deadDeltaIds.nonEmpty, "fixture: no delta ids to tombstone")
    VectorOps.ivfPqDelete(spark, base, deadIds.unionByName(deadDelta))
    val masked =
      rows(VectorOps.searchStored(spark, dir, base, Seq("lists_delta")))
    assert(!masked.exists(r => r(4).asInstanceOf[Long] %
      VectorOps.AddModulus == VectorOps.DeleteResidue))
    assert(!masked.exists(r =>
      deadDeltaIds.contains(r(4).asInstanceOf[Long])),
      "a tombstoned DELTA id survived the masked delta-union search")
    // the one-shot reference: train on held-out base, encode everything
    // except the deleted ids (both residue classes)
    val oneShot = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_deladdref").toString
    VectorOps.ivfPqPersistFrames(spark, held,
      corpus.filter(residueOf(col("vec_id")) =!= VectorOps.DeleteResidue &&
        col("vec_id") % (VectorOps.AddModulus * 2) =!= VectorOps.AddResidue),
      oneShot)
    assert(masked === rows(VectorOps.searchStored(spark, dir, oneShot, Nil)))
  }

  test("a corpus-swap REBUILD clears stale tombstones, deltas, and the stream watermark") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_rebuild").toString
    // a private corpus copy whose stamp THIS test can change
    corpus.write.parquet(s"$tmp/embeddings.parquet")
    def liveCorpus = VectorOps.embDistributed(spark, tmp)
    val base = VectorOps.ensureIndex(spark, tmp, "rebuildspec", liveCorpus)
    VectorOps.ivfPqDelete(spark, base, deadIds)
    VectorOps.ivfPqAddBatch(spark, tmp, base,
      liveCorpus.limit(50), s"${VectorOps.StreamDeltaPrefix}0")
    VectorOps.ivfPqCompact(spark, base,
      Seq(s"${VectorOps.StreamDeltaPrefix}0"))
    assert(VectorOps.foldedWatermark(spark, base) === 0L)
    VectorOps.ivfPqDelete(spark, base, deadIds)
    VectorOps.ivfPqAddBatch(spark, tmp, base,
      liveCorpus.limit(10), "lists_delta_stale")
    // swap the corpus under the digest-keyed location: same rows, new
    // layout (file count + mtime) — the stamp mismatches
    corpus.coalesce(2)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    VectorOps.ensureIndex(spark, tmp, "rebuildspec", liveCorpus)
    assert(!new java.io.File(s"$base/${VectorOps.DeletesTable}").exists(),
      "stale tombstones survived the rebuild — they would mask live rows")
    assert(!new java.io.File(s"$base/lists_delta_stale").exists(),
      "a stale delta table survived the rebuild")
    assert(VectorOps.foldedWatermark(spark, base) === -1L,
      "a stale stream watermark survived the rebuild — fresh batches would be skipped")
    // the rebuilt index serves the FULL corpus: previously tombstoned
    // ids are neighbors again
    val got = rows(VectorOps.searchStored(spark, tmp, base, Nil))
    assert(got.exists(r => r(4).asInstanceOf[Long] %
      VectorOps.AddModulus == VectorOps.DeleteResidue),
      "rebuild did not surface previously tombstoned rows")
  }
}
