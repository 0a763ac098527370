package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Html
import graft.sources.Ingest
import graft.streaming.Repricer

/** T5 repricing stream + the remaining source/function odds and ends
  * (S3 newest-file, X10 delivery-text normalization).
  */
class RepricerSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("streaming repricer emits exactly the batch-computed actions (T5)") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-offers").toString
    val actions = Files.createTempDirectory("graft-actions").toString
    val ckpt = Files.createTempDirectory("graft-reprice-ckpt").toString

    val settings = Seq(
      (1L, 100.0, 80.0, 120.0, 5.0),
      (2L, 200.0, 150.0, 250.0, 5.0),
      (3L, 50.0, 40.0, 60.0, 5.0)).toDF("sku", "current_price", "min_price", "max_price", "step")
    val offers = Seq(
      """{"sku":1,"merchant":"m1","price":90.0}""",   // -> chase 85
      """{"sku":1,"merchant":"spam","price":1.0}""",  // ignored merchant
      """{"sku":2,"merchant":"m2","price":198.0}""",  // chase 193: |193-200|>step -> action
      """{"sku":2,"merchant":"m2b","price":0.0}""",   // F5: non-positive price dropped
      """{"sku":3,"merchant":"m3","price":10.0}""")   // clamps to 40
    Files.writeString(new java.io.File(landing, "offers_0.json").toPath,
      offers.mkString("\n"))

    val q = Repricer.start(spark, landing, settings, Seq("spam"), actions, ckpt)
    q.awaitTermination(60000L)

    val got = spark.read.json(actions).collect()
      .map(r => r.getAs[Long]("sku") -> r.getAs[Double]("target_price")).toMap
    assert(got === Map(1L -> 85.0, 2L -> 193.0, 3L -> 40.0))
  }

  test("per-SKU interval gating: repriced SKU is skipped within its interval, acted on after (T5)") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-offers-iv").toString
    val actions = Files.createTempDirectory("graft-actions-iv").toString
    val ckpt = Files.createTempDirectory("graft-reprice-iv-ckpt").toString

    val settings = Seq((1L, 100.0, 80.0, 120.0, 5.0, 10L))
      .toDF("sku", "current_price", "min_price", "max_price", "step", "interval_min")
    val t0 = 1700000000000L
    var now = t0
    val clock = () => now
    def drop(n: Int): Unit =
      Files.writeString(new java.io.File(landing, s"offers_$n.json").toPath,
        """{"sku":1,"merchant":"m1","price":90.0}""")

    drop(0) // batch 1 at t0: reprices
    Repricer.start(spark, landing, settings, Nil, actions, ckpt, clock)
      .awaitTermination(60000L)
    now += 5 * 60000L // +5 min < interval_min=10: must be skipped
    drop(1)
    Repricer.start(spark, landing, settings, Nil, actions, ckpt, clock)
      .awaitTermination(60000L)
    now += 6 * 60000L // 11 min since the action: eligible again
    drop(2)
    Repricer.start(spark, landing, settings, Nil, actions, ckpt, clock)
      .awaitTermination(60000L)

    val ts = spark.read.json(actions).collect()
      .map(_.getAs[Long]("action_ts")).sorted.toSeq
    assert(ts === Seq(t0, t0 + 11 * 60000L))
  }

  test("newestFile picks the latest mtime across a glob (S3)") {
    val dir = Files.createTempDirectory("graft-newest")
    Seq("stock_a.csv" -> 1000L, "stock_b.csv" -> 3000L, "stock_c.csv" -> 2000L)
      .foreach { case (n, t) =>
        val f = dir.resolve(n).toFile
        Files.writeString(f.toPath, "x\n1")
        assert(f.setLastModified(1700000000000L + t))
      }
    val newest = Ingest.newestFile(spark, s"$dir/stock_*.csv")
    assert(newest.exists(_.endsWith("stock_b.csv")))
    assert(Ingest.newestFile(spark, s"$dir/none_*.csv").isEmpty)
  }

  test("delivery-text normalization picks postamat/courier lines (X10)") {
    import spark.implicits._
    val text = "Самовывоз завтра\nПостамат: 12 сентября\nДоставка курьером 1 августа"
    val r = Seq(text, "нет данных").toDF("t")
      .select(Html.normalizeDeliveryText(org.apache.spark.sql.functions.col("t"), 2025).as("n"))
      .collect().map(_.getString(0))
    assert(r(0) === "postamat - 12.9.2025, delivery - 1.8.2025")
    assert(r(1) === "postamat - —, delivery - —")
  }
}
