package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Clustering semantics over the real corpus: components are labeled
  * by their minimum doc id, transitive chains merge (multi-hop
  * propagation), and every member's cluster id is a member of its own
  * cluster.
  */
class NearDupClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("components are min-labeled, closed, and chains merge transitively") {
    val pairs = TextOps.minhashNearDup(spark, SparkT.Sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val clusters = TextOps.nearDupClusters(spark, SparkT.Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size")))).toMap

    // every pair member appears; both endpoints share a cluster
    pairs.foreach { case (a, b) =>
      assert(clusters.contains(a) && clusters.contains(b))
      assert(clusters(a)._1 === clusters(b)._1, s"pair ($a,$b) split")
    }
    // label is the component minimum and itself a member
    clusters.groupBy(_._2._1).foreach { case (label, members) =>
      assert(members.keySet.min === label)
      assert(members.contains(label))
      members.values.foreach { case (_, size) => assert(size === members.size) }
    }
    // reference union-find over the pairs agrees exactly
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    clusters.foreach { case (doc, (label, _)) =>
      assert(find(doc) === label, s"doc $doc: spark=$label union-find=${find(doc)}")
    }
  }

  test("long-path graph converges in O(log diameter) rounds (pointer jumping)") {
    import spark.implicits._
    // a 200-node chain: diameter 199. Plain min-propagation needs 199
    // rounds; min-propagation + pointer jumping doubles the label hop
    // distance per round, so convergence is logarithmic.
    val chain = (0 until 199).map(i => (1000L + i, 1000L + i + 1))
      .toDF("doc_a", "doc_b")
    val (labels, rounds) = TextOps.connectedComponents(chain, maxRounds = 30)
    try {
      val got = labels.collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
      assert(got.length === 200)
      got.foreach { case (doc, label) => assert(label === 1000L, s"doc $doc") }
      assert(rounds <= 8, s"took $rounds rounds")
    } finally labels.unpersist()
  }

  test("adversarial 1000-node chain: log-round convergence well under maxRounds") {
    import spark.implicits._
    // diameter 999 — fatal for linear propagation under maxRounds=30,
    // comfortable for pointer jumping (label hop distance doubles per
    // round, so ~log2(999) ≈ 10 rounds). This is the planted worst case
    // for the default bound: if a future edit degrades the jump to
    // plain propagation, this test fails on rounds, not on wall time.
    val chain = (0 until 999).map(i => (5000L + i, 5000L + i + 1))
      .toDF("doc_a", "doc_b")
    val (labels, rounds) = TextOps.connectedComponents(chain)
    try {
      val got = labels.collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
      assert(got.length === 1000)
      got.foreach { case (doc, label) => assert(label === 5000L, s"doc $doc") }
      assert(rounds <= 11, s"took $rounds rounds — pointer jumping degraded")
    } finally labels.unpersist()
  }

  test("two disjoint components never merge and each is min-labeled") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val (labels, _) = TextOps.connectedComponents(pairs)
    try {
      val got = labels.collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    } finally labels.unpersist()
  }
}
