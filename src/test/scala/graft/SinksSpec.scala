package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

/** Sink contracts, above all the reference's idempotency rule:
  * "rerunning must not duplicate data" (.cursor/rules/one.mdc:12).
  */
class SinksSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").resolve("t").toString

  test("upsertByKey is idempotent: rerunning the same batch changes nothing") {
    val path = tmp("upsert")
    val batch = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    Sinks.upsertByKey(batch, path, Seq("k"))
    Sinks.upsertByKey(batch, path, Seq("k"))   // rerun — must not duplicate
    val out = spark.read.parquet(path)
    assert(out.count() === 2)
  }

  test("upsertByKey replaces matched keys and keeps the rest") {
    val path = tmp("upsert2")
    Sinks.upsertByKey(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v"), path, Seq("k"))
    Sinks.upsertByKey(
      Seq((2L, "b2", 25.0), (3L, "c", 30.0)).toDF("k", "name", "v"), path, Seq("k"))
    val out = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out === Map(
      1L -> ("a", 10.0),    // untouched
      2L -> ("b2", 25.0),   // replaced
      3L -> ("c", 30.0)))   // inserted
  }

  test("exportCsv enforces the fixed column contract (PRICEBOT_SPEC_V2.md:84-90)") {
    val path = tmp("csv")
    val df = Seq((1L, "s1", 100.0)).toDF("productId", "sku", "price")
    intercept[IllegalArgumentException] {
      Sinks.exportCsv(df, path, Seq("productId", "sku", "price", "pricebot_status"))
    }
    Sinks.exportCsv(df, path, Seq("sku", "productId", "price"))
    val back = spark.read.option("header", "true").csv(path)
    assert(back.columns.toSeq === Seq("sku", "productId", "price"))
    assert(back.count() === 1)
  }

  test("overwrite replaces, append accumulates, writeJson round-trips (K1/K3/K6)") {
    val p1 = tmp("k1")
    val df = Seq((1L, "a")).toDF("k", "v")
    Sinks.overwrite(df, p1)
    Sinks.overwrite(df, p1)                       // full replace, not 2x
    assert(spark.read.parquet(p1).count() === 1)
    Sinks.append(df, p1)
    assert(spark.read.parquet(p1).count() === 2)  // append accumulates
    val p2 = tmp("k6")
    Sinks.writeJson(df, p2)
    val back = spark.read.json(p2).collect()
    assert(back.map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSeq ===
      Seq((1L, "a")))
  }

  test("writeXlsx refuses a frame over the single-workbook row cap") {
    val big = spark.range(0, 20).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    val path = tmp("xlsx_cap") + "/over.xlsx"
    // plant a valid previous export at the destination: an over-cap
    // abort must leave it byte-identical (atomic temp+rename), never a
    // truncated partial zip
    graft.sources.Excel.writeXlsx(big.limit(3), path)
    val before = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val e = intercept[IllegalArgumentException] {
      graft.sources.Excel.writeXlsxCapped(big, path, "Sheet1", cap = 10L)
    }
    assert(e.getMessage.contains("single-workbook"))
    val after = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    assert(java.util.Arrays.equals(before, after),
      "aborted export must not touch the destination")
    assert(graft.sources.Excel.readXlsx(spark, path).count() === 3)
    assert(!new java.io.File(path).getParentFile.listFiles()
      .exists(_.getName.endsWith(".tmp")), "abort must clean up its temp file")
    // under the cap the same frame exports fine
    val ok = tmp("xlsx_ok") + "/ok.xlsx"
    graft.sources.Excel.writeXlsx(big, ok)
    assert(graft.sources.Excel.readXlsx(spark, ok).count() === 20)
  }

  test("appendNdjsonPartitioned lands one directory per key and appends") {
    val path = tmp("ndjson")
    val b1 = Seq((1L, 5.0), (2L, 6.0)).toDF("user_id", "v")
    Sinks.appendNdjsonPartitioned(b1, path, "user_id")
    Sinks.appendNdjsonPartitioned(b1, path, "user_id")
    val back = spark.read.json(path)
    assert(back.count() === 4) // append semantics, partition dirs readable
    assert(new java.io.File(path).listFiles().exists(_.getName.startsWith("user_id=")))
  }

  test("writeXlsxSharded: one workbook per non-empty partition + manifest agrees") {
    import graft.sources.Excel
    val dir = tmp("xlsx_sharded")
    // 8 partitions over 20 keys → some partitions may be empty; empty
    // partitions must produce neither a shard nor a manifest row
    val src = spark.range(0, 20)
      .selectExpr("id AS k", "CAST(id * 10 AS STRING) AS v")
      .repartition(8, $"k")
    val manifest = Excel.writeXlsxSharded(src, dir).collect()
    val shardFiles = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".xlsx")).map(_.getName).sorted
    assert(manifest.map(_.getAs[String]("file")).sorted.toSeq === shardFiles.toSeq)
    assert(manifest.map(_.getAs[Long]("n_rows")).sum === 20L)
    assert(manifest.forall(_.getAs[Long]("n_rows") > 0L), "no empty shards")
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".tmp")))
    // read-back through the distributed reader's glob is the exact union
    val back = Excel.readXlsx(spark, s"$dir/part-*.xlsx")
    assert(back.count() === 20)
    assert(back.select($"k".cast("long")).as[Long].collect().sorted.toSeq ===
      (0L until 20L))
    // rerun = overwrite: same layout, no accumulation
    Excel.writeXlsxSharded(src, dir)
    assert(Excel.readXlsx(spark, s"$dir/part-*.xlsx").count() === 20)
  }

  test("writeXlsxSharded enforces the per-shard row cap task-side") {
    import graft.sources.Excel
    val dir = tmp("xlsx_sharded_cap")
    val src = spark.range(0, 30)
      .selectExpr("id AS k", "CAST(id AS STRING) AS v")
      .repartition(2)
    val e = intercept[org.apache.spark.SparkException] {
      Excel.writeXlsxSharded(src, dir, capPerShard = 5L)
    }
    assert(e.getMessage.contains("per-workbook cap") ||
      Option(e.getCause).exists(_.getMessage.contains("per-workbook cap")))
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".tmp")),
      "aborted shards must clean up their temp files")
  }
}
