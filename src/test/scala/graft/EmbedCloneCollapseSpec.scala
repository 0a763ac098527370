package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Exact-clone pre-collapse law for the embedding near-dup bander: on
  * a corpus with planted byte-identical vectors, the collapsed build
  * (bucket-join one canonical per distinct vector content, re-expand
  * pairs through group membership) must emit EXACTLY the pair rows of
  * the flat per-vector build — ids, orientation (vec_a < vec_b) and
  * rounded cosine included. The driver oracle cannot state this law
  * (its corpus has no exact clone vectors, so collapse is a
  * size-1-groups no-op there); this is the property that makes the
  * sf10 embed near-dup family sub-quadratic in clone multiplicity
  * (replica-derived corpora carry ~100 byte-identical copies of every
  * vector).
  */
class EmbedCloneCollapseSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  /** Deterministic synthetic corpus: 24 distinct vectors, the first 6
    * planted with 4, 3, 3, 2, 2, 2 byte-identical clones under fresh
    * ids interleaved ACROSS the id space (so pair orientation after
    * re-expansion must really come from least/greatest over member
    * ids, not from canonical adjacency).
    */
  private def corpus(): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def vec(seed: Int): Array[Float] = Array.tabulate(VectorOps.Dim) { d =>
      val hex = md.digest(s"embclone_${seed}_$d".getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex, 16) % 1001 - 500) / 500.0).toFloat
    }
    val base = (0 until 24).map(vec)
    val clones = Seq(0 -> 4, 1 -> 3, 2 -> 3, 3 -> 2, 4 -> 2, 5 -> 2)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]()
    base.zipWithIndex.foreach { case (v, i) => rows += ((i.toLong, v)) }
    for ((b, m) <- clones; r <- 1 until m)
      rows += ((100L + 100L * b + 13L * r, base(b)))
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  private def collect(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
      r.getAs[Double]("cos_sim"))).toSet

  test("collapsed build == flat build on a clone-planted corpus, at two plane counts") {
    val e = corpus()
    for (planes <- Seq(VectorOps.NPlanes, 6)) {
      val flat = collect(VectorOps.embedNearDupFlatFrom(e, planes, 8))
      val fast = collect(VectorOps.embedNearDupCollapsed(e, planes, 8))
      assert(flat.nonEmpty)
      assert(fast === flat,
        s"planes=$planes fast-only: ${fast -- flat}; flat-only: ${flat -- fast}")
    }
  }

  test("within-family pairs carry the canonical's computed self-cosine") {
    val e = corpus()
    val rows = VectorOps.embedNearDupCollapsed(e, VectorOps.NPlanes, 8)
      .collect()
    // the 4-clone family of base vector 0: ids 0, 113, 126, 139
    val fam = Set(0L, 113L, 126L, 139L)
    val within = rows.filter(r =>
      fam(r.getAs[Long]("vec_a")) && fam(r.getAs[Long]("vec_b")))
    assert(within.length === 6) // C(4,2) — every clone pair, exactly once
    val selfCos = within.head.getAs[Double]("cos_sim")
    assert(within.forall(_.getAs[Double]("cos_sim") == selfCos))
    assert(selfCos > 0.99)
    // orientation law: every emitted pair is (smaller id, larger id)
    assert(rows.forall(r =>
      r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b")))
  }

  test("the deployed embedNearDup path equals the flat reference on the real corpus") {
    val e = Tables.load(spark, SparkT.Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val planes = VectorOps.derivedPlanes(e.count())
    val flat = collect(VectorOps.embedNearDupFlatFrom(
      e, planes, spark.sparkContext.defaultParallelism))
    val deployed = collect(VectorOps.embedNearDup(spark, SparkT.Sf0001))
    assert(deployed === flat)
  }
}
