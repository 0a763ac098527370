package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-JVM idempotency contract of TextOps.signatureTable:
  * a fresh catalog with a stale warehouse location — the state every
  * second JVM run starts in, because the in-memory catalog dies with
  * the session while the managed table's files persist — must rebuild
  * cleanly instead of throwing LOCATION_ALREADY_EXISTS (the round-4
  * regression that took down all four MinHash queries).
  */
class SignatureTableSpec extends AnyFunSuite {
  private val spark = SparkT.spark

  private def copyTree(src: Path, dst: Path): Unit =
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else {
        Files.createDirectories(t.getParent)
        Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      }
    }

  test("rebuild succeeds when the catalog is fresh but the warehouse location is stale") {
    // Private corpus dir → private table name (digest of the dir string),
    // so this suite cannot race other consumers of the shared sf0.001 table.
    val corpus = Files.createTempDirectory("graft-sigtab-corpus")
    Files.copy(Paths.get(SparkT.Sf0001, "documents.parquet"),
      corpus.resolve("documents.parquet"))

    val n = operators.TextOps.signatureTable(spark, corpus.toString).count()
    assert(n > 0)

    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(corpus.toString.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    val name = s"graft_minhash_sig_$digest"
    val loc = Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    assert(Files.exists(loc), s"expected managed-table location at $loc")

    // Reconstruct the second-JVM state in-process: back up the table
    // files, DROP TABLE (removes catalog entry AND deletes the managed
    // location), then restore the files — catalog empty, location stale.
    val backup = Files.createTempDirectory("graft-sigtab-backup").resolve(name)
    copyTree(loc, backup)
    spark.sql(s"DROP TABLE $name")
    assert(!Files.exists(loc), "managed DROP TABLE should delete the location")
    copyTree(backup, loc)
    assert(!spark.catalog.tableExists(name) && Files.exists(loc))

    assert(operators.TextOps.signatureTable(spark, corpus.toString).count() === n)
  }
}
