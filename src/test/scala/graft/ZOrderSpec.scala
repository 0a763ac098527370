package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ZOrder

/** Z-order layout laws:
  *   - the Morton key expression matches a bit-twiddling reference
  *     implementation exactly;
  *   - the clustered layout's row-group envelopes skip most of the
  *     table for the box query ON-DISK (parquet footer statistics, not
  *     scan timings), and prune on EACH single dimension — the property
  *     a linear one-column sort cannot give and an arrival-order layout
  *     gives for neither;
  *   - both range predicates reach the clustered scan as PushedFilters.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def refMorton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("morton key expression equals the reference bit-interleave") {
    import spark.implicits._
    val xs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (7L, 5L), (123456L, 654321L),
      ((1L << 20) - 1, (1L << 20) - 1))
    val got = xs.toDF("x", "y")
      .select(ZOrder.mortonKey(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === xs.map { case (x, y) => refMorton(x, y, ZOrder.MortonBits) })
  }

  // sf0.01, not sf0.001: at 6k rows the suppkey domain (10 values)
  // collapses to 3-4 bits, so every ~190-row group straddles every
  // suppkey slice — too coarse for the single-dimension assertion.
  // At sf0.01 both key spaces (2000 x 100) carry enough bits that the
  // curve fixes high bits of EACH dimension across row groups.
  test("z-order layout skips row groups on the box and on each single dimension") {
    val zPath = Files.createTempDirectory("graft_zorder_spec").toString
    val lPath = Files.createTempDirectory("graft_linear_spec").toString
    val src = Tables.load(spark, SparkT.Sf001, "lineitem")
      .select("l_partkey", "l_suppkey", "l_returnflag", "l_extendedprice")
    ZOrder.zorderWrite(src, "l_partkey", "l_suppkey", zPath, ZOrder.ZFiles)
    // arrival-order baseline: same file count, no clustering
    src.repartition(ZOrder.ZFiles).write.mode("overwrite").parquet(lPath)

    val cols = Seq("l_partkey", "l_suppkey")
    val zRg = ZOrder.rowGroupRanges(spark, zPath, cols)
    val lRg = ZOrder.rowGroupRanges(spark, lPath, cols)
    assert(zRg.size >= ZOrder.ZFiles / 2 && lRg.size >= ZOrder.ZFiles / 2,
      s"layouts too coarse to test: ${zRg.size} vs ${lRg.size} row groups")

    val box = Map(
      "l_partkey" -> (ZOrder.PartLo, ZOrder.PartHi),
      "l_suppkey" -> (ZOrder.SuppLo, ZOrder.SuppHi))
    // arrival order: every row group straddles the box
    assert(ZOrder.overlapping(lRg, box) === lRg.size,
      "baseline unexpectedly clustered — box assertion is vacuous")
    // z-order: most row groups' envelopes miss the box entirely
    val zBox = ZOrder.overlapping(zRg, box)
    assert(zBox <= zRg.size / 2,
      s"box query should skip most row groups: reads $zBox of ${zRg.size}")
    // and EACH single-dimension slice prunes too (the multi-dim win)
    val partOnly = Map("l_partkey" -> (ZOrder.PartLo, ZOrder.PartHi))
    val suppOnly = Map("l_suppkey" -> (ZOrder.SuppLo, ZOrder.SuppHi))
    assert(ZOrder.overlapping(zRg, partOnly) < zRg.size,
      "partkey-only slice should prune some row groups")
    assert(ZOrder.overlapping(zRg, suppOnly) < zRg.size,
      "suppkey-only slice should prune some row groups")

    // the box query over both layouts returns identical rows
    def agg(path: String) = spark.read.parquet(path)
      .filter(col("l_partkey").between(ZOrder.PartLo, ZOrder.PartHi) &&
        col("l_suppkey").between(ZOrder.SuppLo, ZOrder.SuppHi))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect().toSeq
    assert(agg(zPath) === agg(lPath))
  }

  test("box predicates reach the clustered scan as PushedFilters") {
    // the default 100-char metadata clip truncates the PushedFilters
    // list mid-predicate — widen it for the assertion's lifetime
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val plan =
      try {
        val df = ZOrder.zorderRoundtrip(spark, SparkT.Sf0001)
        df.collect()
        df.queryExecution.executedPlan.toString
      } finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert(plan.contains("GreaterThanOrEqual(l_partkey,40)") &&
      plan.contains("LessThanOrEqual(l_partkey,90)") &&
      plan.contains("GreaterThanOrEqual(l_suppkey,2)") &&
      plan.contains("LessThanOrEqual(l_suppkey,6)"),
      s"range predicates not pushed to the scan:\n$plan")
  }
}
