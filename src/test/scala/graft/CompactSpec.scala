package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compact

/** Compaction laws: the rewrite shrinks a many-small-files directory
  * to the scan packer's bin plan (one task per output file, zero
  * shuffle), respects the per-file size target, and loses or
  * duplicates no rows.
  */
class CompactSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def fileSizes(path: String): Seq[Long] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen)
  }

  test("compaction shrinks to the bin plan with no shuffle and no row change") {
    val many = Files.createTempDirectory("graft_compact_many").toString
    val out = Files.createTempDirectory("graft_compact_out").toString
    val src = Tables.load(spark, SparkT.Sf001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_returnflag", "l_extendedprice")
    src.repartition(Compact.SmallFiles).write.mode("overwrite").parquet(many)

    val (before, after) = Compact.compact(spark, many, out)
    assert(before === Compact.SmallFiles)

    // output file count = the packer's bin count: between the
    // no-padding lower bound and the everything-padded upper bound
    val inBytes = fileSizes(many)
    val lo = math.max(1,
      math.ceil(inBytes.sum.toDouble / Compact.TargetBytes).toInt)
    val hi = math.max(1, math.ceil(
      inBytes.map(_ + Compact.OpenCostBytes).sum.toDouble /
        Compact.TargetBytes).toInt)
    assert(after >= lo && after <= hi,
      s"bin plan violated: $after files outside [$lo, $hi] " +
        s"(in: ${inBytes.size} files, ${inBytes.sum} bytes)")
    assert(after < before / 4, s"compaction barely compacted: $before -> $after")

    // every output file respects the target (2x slack: bins are
    // measured on input compressed bytes, output re-compresses)
    val outSizes = fileSizes(out)
    assert(outSizes.forall(_ <= Compact.TargetBytes * 2),
      s"oversized output file: ${outSizes.max} bytes")

    // the compaction scan is the bin plan: partition count == output
    // files, and the plan has no exchange (narrow rewrite)
    spark.conf.set("spark.sql.files.maxPartitionBytes", Compact.TargetBytes.toString)
    spark.conf.set("spark.sql.files.openCostInBytes", Compact.OpenCostBytes.toString)
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    try {
      val scan = spark.read.parquet(many)
      assert(scan.rdd.getNumPartitions === after)
      assert(!scan.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
      spark.conf.unset("spark.sql.files.openCostInBytes")
      spark.conf.unset("spark.sql.files.minPartitionNum")
    }

    // row fidelity: exact multiset via count + per-key checksum
    val a = src.agg(count(lit(1)), sum(hash(col("l_orderkey"), col("l_partkey"),
      col("l_returnflag"), col("l_extendedprice")).cast("long"))).collect()
    val b = spark.read.parquet(out).agg(count(lit(1)),
      sum(hash(col("l_orderkey"), col("l_partkey"), col("l_returnflag"),
        col("l_extendedprice")).cast("long"))).collect()
    assert(a.toSeq === b.toSeq)
  }
}
