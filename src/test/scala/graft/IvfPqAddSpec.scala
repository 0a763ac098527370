package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** The incremental-ADD contract of the persisted IVF-PQ index (the
  * faiss add-after-train lifecycle): a batch added against the STORED
  * quantizers must (a) train nothing — zero Lloyd iterations composed —
  * (b) leave the searched result identical to a one-shot index that
  * trained on the base corpus and encoded everything, (c) keep the
  * probed-cell restriction reaching BOTH lists scans as dynamic
  * partition pruning, and (d) be idempotent under re-admission of the
  * same batch.
  */
class IvfPqAddSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark
  private val dir = SparkT.Sf0001

  test("add-then-search == one-shot index trained on base, encoding everything") {
    val viaAdd = VectorOps.ivfPqIndexAdd(spark, dir)
      .drop("from_delta").collect().map(_.toSeq).toSet
    assert(viaAdd.nonEmpty)

    // reference: ONE index whose quantizers trained on base but whose
    // lists encode the full corpus — what base ∪ delta must equal
    val oneShot = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_oneshot").toString
    val base = VectorOps.embBase(spark, dir)
    val all = VectorOps.embDistributed(spark, dir)
    VectorOps.ivfPqPersistFrames(spark, base, all, oneShot)
    val viaOneShot = VectorOps.annIvfPqFromIndex(spark, dir, oneShot)
      .filter(org.apache.spark.sql.functions.col("rank") <= VectorOps.TopKPq)
      .select("q_id", "cell", "cell_sim", "rank", "neighbor_id", "approx_sim")
      .collect().map(_.toSeq).toSet
    assert(viaAdd === viaOneShot)
  }

  test("the add path composes ZERO Lloyd iterations; the build composes the full ladder") {
    val base = VectorOps.indexBase(dir, "add")
    val baseCorpus = VectorOps.embBase(spark, dir)

    VectorOps.LloydMeter.reset()
    VectorOps.ivfPqPersistFrames(spark, baseCorpus, baseCorpus, base)
    // coarse quantizer + the joint PQ codebook chain, KmeansIters each
    assert(VectorOps.LloydMeter.iterations.get() === 2L * VectorOps.KmeansIters)

    VectorOps.LloydMeter.reset()
    VectorOps.ivfPqAdd(spark, dir, base)
    assert(VectorOps.LloydMeter.iterations.get() === 0L,
      "the incremental add re-trained a quantizer")
  }

  test("base AND delta lists scans are dynamically pruned to the probed cells") {
    val base = VectorOps.indexBase(dir, "add")
    val baseCorpus = VectorOps.embBase(spark, dir)
    VectorOps.ivfPqPersistFrames(spark, baseCorpus, baseCorpus, base)
    VectorOps.ivfPqAdd(spark, dir, base)
    val plan = VectorOps.annIvfPqFromIndexWithDelta(spark, dir, base)
      .queryExecution.executedPlan.toString
    val prunes = "dynamicpruning".r.findAllIn(plan).size
    assert(prunes >= 2,
      s"expected both lists scans pruned, found $prunes:\n$plan")
  }

  test("re-admitting the same batch is idempotent: same result, same delta row count") {
    val r1 = VectorOps.ivfPqIndexAdd(spark, dir).collect().map(_.toSeq).toSet
    val base = VectorOps.indexBase(dir, "add")
    val n1 = spark.read.parquet(s"$base/lists_delta").count()
    val r2 = VectorOps.ivfPqIndexAdd(spark, dir).collect().map(_.toSeq).toSet
    val n2 = spark.read.parquet(s"$base/lists_delta").count()
    assert(r1 === r2)
    assert(n1 === n2, "delta lists grew on re-admission")
  }

  test("delta neighbors actually surface: the add is visible in the top-k") {
    val r = VectorOps.ivfPqIndexAdd(spark, dir)
    val deltaHits = r.filter(org.apache.spark.sql.functions.col("from_delta"))
      .count()
    assert(deltaHits > 0,
      "no added vector reached any query's top-k — the add is untested by the row")
  }

  test("chained adds: add-add-then-search == one-shot on base held out both batches") {
    import org.apache.spark.sql.functions.col
    val viaChain = VectorOps.ivfPqIndexAddChain(spark, dir)
    val rows = viaChain.collect()
    assert(rows.nonEmpty)
    // both arriving batches are represented in the searched index
    // (from_batch recomputes from the id rule, so this pins that
    // neither delta table was dropped by the union search)
    val batches = rows.map(_.getAs[Int]("from_batch")).toSet
    assert(batches.contains(1) || batches.contains(2),
      s"no added vector surfaced at all: $batches")

    val oneShot = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_oneshot2").toString
    val both = VectorOps.embDistributed(spark, dir)
      .filter(col("vec_id") % VectorOps.AddModulus =!= VectorOps.AddResidue &&
        col("vec_id") % VectorOps.AddModulus =!= VectorOps.AddResidue2)
    val all = VectorOps.embDistributed(spark, dir)
    VectorOps.ivfPqPersistFrames(spark, both, all, oneShot)
    val ref = VectorOps.annIvfPqFromIndex(spark, dir, oneShot)
      .filter(col("rank") <= VectorOps.TopKPq)
      .select("q_id", "cell", "cell_sim", "rank", "neighbor_id", "approx_sim")
      .collect().map(_.toSeq).toSet
    assert(viaChain.drop("from_batch").collect().map(_.toSeq).toSet === ref)

    // all three lists scans (base + two deltas) prune to probed cells
    val plan = VectorOps.searchStored(spark, dir,
        VectorOps.indexBase(dir, "addchain"),
        Seq("lists_delta_b1", "lists_delta_b2"))
      .queryExecution.executedPlan.toString
    val prunes = "dynamicpruning".r.findAllIn(plan).size
    assert(prunes >= 3, s"expected 3 pruned scans, found $prunes")
  }
}
