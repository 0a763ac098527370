package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The image perceptual-hash near-dup channel: (a) the PNG
  * encode→decode roundtrip is lossless for the dHash — the engine's
  * hash of the DECODED pixels equals the hash recomputed directly from
  * the pixel formula, token by token; (b) the banded pair join obeys
  * the pigeonhole recall law — at Hamming ≤ [[Multimodal.ImgMaxHamming]]
  * with 4 bands it finds EXACTLY the brute-force pair set over kept
  * images, never a subset; (c) the low-entropy guard keeps flat
  * renders out of the channel without losing their hash rows.
  */
class ImageNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark
  private val dir = SparkT.Sf0001

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The pixel formula replayed in plain Scala (no Spark, no codec):
    * token index k·n div (W·H), byte = first 2 md5 hex digits,
    * palette, luminance, sampled-grid dHash bands + entropy.
    */
  private def expectedHash(tokens: Array[String]): (Array[Int], Int) = {
    import Multimodal._
    val n = tokens.length
    val gray = Array.tabulate(DHashRows, DHashCols) { (cy, cx) =>
      val k = (cy * ImgH / DHashRows) * ImgW + cx * ImgW / DHashCols
      val g = Integer.parseInt(md5Hex(tokens(k * n / (ImgW * ImgH))).take(2), 16)
      val (r, gg, b) = imgPalette(g)
      imgGray(r, gg, b)
    }
    val bands = new Array[Int](ImgBands)
    var idx = 0
    for (cy <- 0 until DHashRows; cx <- 0 until DHashCols - 1) {
      if (gray(cy)(cx + 1) > gray(cy)(cx))
        bands(idx / ImgBandBits) |= 1 << (idx % ImgBandBits)
      idx += 1
    }
    (bands, gray.iterator.flatten.toSet.size)
  }

  test("dHash of the DECODED png == dHash from the pixel formula (lossless codec roundtrip)") {
    val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast("int")
    val toks = Tables.load(spark, dir, "documents")
      .filter(srcNum % 3 === 0)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toArray)
      .toMap
    assert(toks.nonEmpty)
    val got = Multimodal.imageDHash(Multimodal.imageCorpus(spark, dir))
      .collect()
    assert(got.length === toks.size)
    got.foreach { h =>
      val (bands, nGray) = expectedHash(toks(h.media_id))
      assert(Seq(h.b0, h.b1, h.b2, h.b3) === bands.toSeq,
        s"media ${h.media_id}: decoded-pixel dHash diverges from the formula")
      assert(h.n_gray === nGray, s"media ${h.media_id}: entropy diverges")
    }
  }

  test("banded pairs == brute-force Hamming<=3 over kept images (pigeonhole recall law)") {
    import Multimodal._
    val hashes = imageDHash(imageCorpus(spark, dir)).collect()
    val kept = hashes.filter(_.n_gray >= ImgMinEntropy)
    assert(kept.length < hashes.length,
      "corpus has no low-entropy render — the guard case is untested")
    def ham(a: ImgHash, b: ImgHash): Int =
      Integer.bitCount(a.b0 ^ b.b0) + Integer.bitCount(a.b1 ^ b.b1) +
        Integer.bitCount(a.b2 ^ b.b2) + Integer.bitCount(a.b3 ^ b.b3)
    val brute = (for {
      a <- kept; b <- kept
      if a.media_id < b.media_id && ham(a, b) <= ImgMaxHamming
    } yield (a.media_id, b.media_id, ham(a, b))).toSet
    val banded = imageNearDupPairs(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === brute,
      "banded join missed or invented a Hamming<=3 pair")
    // every emitted pair shares at least one clean band (the law the
    // equi-join relies on)
    imageNearDupPairs(spark, dir).collect().foreach { r =>
      assert(r.getLong(3) >= 1L)
    }
  }
}
