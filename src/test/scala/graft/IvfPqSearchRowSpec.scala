package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** The read-only search row (q_ann_index_search): the first call per
  * corpus may build, every later call must SKIP the build — zero Lloyd
  * iterations — and serve the search path alone, byte-identical to the
  * roundtrip row's search (same corpus, same trained artifacts). A
  * corpus swapped under the digest-keyed location must force a
  * rebuild via the corpus stamp, not serve the stale index.
  */
class IvfPqSearchRowSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark
  private val dir = SparkT.Sf0001

  test("search row == roundtrip row's search; repeat calls compose ZERO Lloyd") {
    val first = VectorOps.ivfPqIndexSearch(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(first.nonEmpty)

    VectorOps.LloydMeter.reset()
    val second = VectorOps.ivfPqIndexSearch(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(VectorOps.LloydMeter.iterations.get() === 0L,
      "the second call rebuilt the index — the benched repeats would be build+search")
    assert(second === first)

    val roundtrip = VectorOps.ivfPqIndexRoundtrip(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(second === roundtrip)
  }

  test("the SQL-surface twin hash-equals the DataFrame row and keeps DPP at the scan") {
    val df = VectorOps.ivfPqIndexSearch(spark, dir)
      .collect().map(_.toSeq).toSet
    val sqlRow = VectorOps.ivfPqIndexSearchSql(spark, dir)
    VectorOps.LloydMeter.reset()
    val viaSql = sqlRow.collect().map(_.toSeq).toSet
    assert(VectorOps.LloydMeter.iterations.get() === 0L,
      "the SQL twin rebuilt the index instead of sharing the build gate")
    assert(viaSql === df)
    val plan = VectorOps.ivfPqIndexSearchSql(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"SQL-surface lists scan lost dynamic partition pruning:\n$plan")
  }

  test("the masked delta-union SQL twin == the DataFrame masked read; DPP on BOTH scans, one anti-join mask") {
    // the maintenance-window read in pure SQL (q_ann_index_masked_sql)
    // must equal searchStored over the SAME stored layout: base lists ∪
    // the pending delta, tombstones masked — the add and delete laws
    // composed, dual-surface
    val viaSql = VectorOps.ivfPqIndexMaskedSql(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(viaSql.nonEmpty)
    val base = VectorOps.indexBase(dir, "sqlmask")
    val df = VectorOps.searchStored(spark, dir, base, Seq("lists_delta"))
      .filter(org.apache.spark.sql.functions.col("rank") <= VectorOps.TopKPq)
      .withColumn("from_delta",
        org.apache.spark.sql.functions.col("neighbor_id") %
          VectorOps.AddModulus === VectorOps.AddResidue)
      .select("q_id", "cell", "cell_sim", "rank", "neighbor_id",
        "approx_sim", "from_delta")
      .collect().map(_.toSeq).toSet
    assert(viaSql === df,
      "SQL masked delta-union read diverged from the DataFrame form")
    val plan = VectorOps.ivfPqIndexMaskedSql(spark, dir)
      .queryExecution.executedPlan.toString
    val prunedScans = plan.linesIterator.count(l =>
      l.contains("PartitionFilters") && l.contains("dynamicpruning"))
    assert(prunedScans >= 2,
      s"expected DPP on both the base and delta scans, found $prunedScans:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"the tombstone mask is not an anti-join in the SQL plan:\n$plan")
  }

  test("nprobe dial: probe-2 candidates are a SUPERSET of probe-1's, two cells probed, zero Lloyd") {
    VectorOps.ivfPqIndexSearch(spark, dir).collect() // ensure built
    val base = VectorOps.indexBase(dir, "search")
    def neighbors(nprobe: Int) =
      VectorOps.searchStored(spark, dir, base, Nil, nprobe)
        .select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val n1 = neighbors(1)
    val n2 = neighbors(2)
    assert(n1.subsetOf(n2),
      "probe-1 candidates are not a subset of probe-2's — the dial is not monotone")
    assert(n2.size > n1.size,
      "probe 2 scanned no additional cell — the dial did nothing")
    val cellsPerQ = VectorOps.searchStored(spark, dir, base, Nil, 2)
      .select("q_id", "cell").distinct().collect()
      .groupBy(_.getLong(0)).values.map(_.length)
    assert(cellsPerQ.forall(_ <= 2) && cellsPerQ.exists(_ == 2),
      s"expected up to two probed cells per query: $cellsPerQ")
    VectorOps.LloydMeter.reset()
    assert(VectorOps.ivfPqIndexSearchProbe2(spark, dir).collect().nonEmpty)
    assert(VectorOps.LloydMeter.iterations.get() === 0L,
      "the probe-2 row rebuilt instead of sharing the build gate")
  }

  test("a corpus-stamp mismatch forces a rebuild instead of serving a stale index") {
    VectorOps.ivfPqIndexSearch(spark, dir).collect()
    val stamp = java.nio.file.Paths.get(
      VectorOps.indexBase(dir, "search"), "_corpus_stamp.json")
    java.nio.file.Files.write(stamp,
      """{"path":"swapped","mtime":0,"len":0}""".getBytes("UTF-8"))
    VectorOps.LloydMeter.reset()
    val r = VectorOps.ivfPqIndexSearch(spark, dir).collect().map(_.toSeq).toSet
    assert(VectorOps.LloydMeter.iterations.get() > 0L,
      "stale stamp did not trigger a rebuild")
    assert(r.nonEmpty)
  }
}
