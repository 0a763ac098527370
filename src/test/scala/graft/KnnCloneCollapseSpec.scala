package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Exact-clone pre-collapse law for the kNN edge builder: on a corpus
  * with planted byte-identical vectors (the embeddings of exact-dup
  * documents), the clone-collapsed build (band one canonical per
  * distinct vector content, group-level top-(k+1), member re-expansion
  * with self-exclusion) must emit EXACTLY the edge rows of the flat
  * per-vector build — rank, cosine and reciprocal flag included. This
  * is the law the driver oracle cannot state (the oracle corpus has no
  * exact clone vectors, so collapse is a size-1-groups no-op there),
  * and the property that makes the sf10 kNN family sub-quadratic in
  * clone multiplicity.
  */
class KnnCloneCollapseSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  /** Deterministic synthetic corpus: 24 distinct vectors (md5-derived
    * coordinates, same style as the engine's hyperplanes), the first 6
    * planted with 4, 3, 3, 2, 2, 2 byte-identical clones under fresh
    * ids interleaved ACROSS the id space (so canonicals are not always
    * the densest region and re-expansion must really route by content,
    * not id adjacency).
    */
  private def corpus(): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def vec(seed: Int): Array[Float] = Array.tabulate(VectorOps.Dim) { d =>
      val hex = md.digest(s"knnclone_${seed}_$d".getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex, 16) % 1001 - 500) / 500.0).toFloat
    }
    val base = (0 until 24).map(vec)
    val clones = Seq(0 -> 4, 1 -> 3, 2 -> 3, 3 -> 2, 4 -> 2, 5 -> 2)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]()
    base.zipWithIndex.foreach { case (v, i) => rows += ((i.toLong, v)) }
    // non-contiguous clone ids: replica r of base b lands at
    // 100 + 100b + 13r, far from (and interleaved across) the bases
    for ((b, m) <- clones; r <- 1 until m)
      rows += ((100L + 100L * b + 13L * r, base(b)))
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  private def collect(df: DataFrame): Set[(Long, Int, Long, Double, Boolean)] =
    df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rank"),
      r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"),
      r.getAs[Boolean]("reciprocal"))).toSet

  test("collapsed build == flat build on a clone-planted corpus, at two plane counts") {
    val e = corpus()
    for (planes <- Seq(VectorOps.NPlanes, 6)) {
      val flat = collect(VectorOps.knnEdgesFlatFrom(e, planes, 8))
      val fast = collect(VectorOps.knnEdgesFrom(e, planes, 8))
      assert(flat.nonEmpty)
      assert(fast === flat,
        s"planes=$planes fast-only: ${fast -- flat}; flat-only: ${flat -- fast}")
    }
  }

  test("clone members see their clones as nearest neighbors at the real self-cosine") {
    val e = corpus()
    val rows = VectorOps.knnEdgesFrom(e, VectorOps.NPlanes, 8).collect()
    // the 4-clone family of base vector 0: ids 0, 113, 126, 139
    val family = rows.filter(r => r.getAs[Long]("vec_id") == 0L)
      .sortBy(_.getAs[Int]("rank"))
    assert(family.take(3).map(_.getAs[Long]("neighbor_id")).toSet
      === Set(113L, 126L, 139L))
    // within-clone cosine is the COMPUTED self-dot (rounded), shared
    // by every member pair — not an assumed literal
    val selfCos = family.head.getAs[Double]("cos_sim")
    assert(family.take(3).forall(_.getAs[Double]("cos_sim") == selfCos))
    assert(selfCos > 0.99)
  }

  test("the deployed knnEdges path equals the flat reference on the real corpus") {
    // A plan-string pin can't see through the eager'd top-k stage
    // (ExistingRDD), so the deployment contract is pinned as full
    // output equality against the flat reference on the driver corpus.
    val e = Tables.load(spark, SparkT.Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val planes = VectorOps.derivedPlanes(e.count())
    val flat = collect(VectorOps.knnEdgesFlatFrom(
      e, planes, spark.sparkContext.defaultParallelism))
    val deployed = collect(VectorOps.knnGraph(spark, SparkT.Sf0001))
    assert(deployed === flat)
  }
}
