package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SinkRoundTrips

/** Training-shard writer (q_train_shards): pins the conservation,
  * contiguity and rerun-determinism laws of the shuffle+shard+write
  * round trip that the driver's manifest hash can't state on its own.
  */
class TrainShardsSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark
  private val dir = SparkT.Sf0001

  private lazy val manifest =
    SinkRoundTrips.trainShardsRoundtrip(spark, dir).collect()

  test("shards conserve the corpus and ids are contiguous from 0") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long").as("nt"))
      .collect().map(_.getLong(0))
    assert(manifest.map(_.getAs[Long]("n_tokens")).sum === docs.sum)
    assert(manifest.map(_.getAs[Long]("n_docs")).sum === docs.length.toLong)
    val ids = manifest.map(_.getAs[Long]("shard_id")).sorted.toSeq
    assert(ids === (0L until ids.length.toLong))
  }

  test("every shard's token mass is within one document of the budget") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import org.apache.spark.sql.functions._
    val maxDoc = docs.select(max(size(split(col("text"), " "))).cast("long"))
      .head().getLong(0)
    val budget = SinkRoundTrips.ShardTokenBudget
    val last = manifest.map(_.getAs[Long]("shard_id")).max
    manifest.foreach { r =>
      val (id, nt) = (r.getAs[Long]("shard_id"), r.getAs[Long]("n_tokens"))
      assert(nt < budget + maxDoc, s"shard $id overshoots: $nt")
      if (id != last) assert(nt > budget - maxDoc, s"shard $id undershoots: $nt")
    }
  }

  test("the round trip is rerun-deterministic (overwrite, not append)") {
    val again = SinkRoundTrips.trainShardsRoundtrip(spark, dir).collect()
    assert(again.map(_.toSeq).toSeq === manifest.map(_.toSeq).toSeq)
  }
}
