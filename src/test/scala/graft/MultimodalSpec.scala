package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Multimodal plumbing: binary columns, frame chunking, the stubbed
  * codec's determinism, and the mapPartitions batch shape.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("media corpus: binary payload with typed modality metadata") {
    val m = Multimodal.media(spark, SparkT.Sf0001)
    assert(m.schema("content").dataType.typeName === "binary")
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("thumbnail truncates payload; frame sampling chunks and strides") {
    import spark.implicits._
    val m = Multimodal.media(spark, SparkT.Sf0001).limit(20)
    val r = m.select(
        octet_length(col("content")).as("full"),
        octet_length(Multimodal.thumbnail(col("content"), 50)).as("thumb"),
        size(Multimodal.sampleFrames(col("content"), 1)).as("all_frames"),
        size(Multimodal.sampleFrames(col("content"), 2)).as("half_frames"))
      .as[(Int, Int, Int, Int)].collect()
    r.foreach { case (full, thumb, allF, halfF) =>
      assert(thumb === math.min(50, full))
      assert(allF === math.ceil(full / Multimodal.FrameBytes.toDouble).toInt)
      assert(halfF === (allF + 1) / 2)
    }
  }

  test("decodeImage: real PNG roundtrip reproduces exact pixel sums") {
    // in-memory ground truth independent of the committed fixtures
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var (er, eg, eb) = (0L, 0L, 0L)
    for (x <- 0 until 5; y <- 0 until 4) {
      val (r, g, b) = ((x * 50 + y) % 256, (y * 60) % 256, (x + y * 7) % 256)
      er += r; eg += g; eb += b
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (w, h, r, g, b) = Multimodal.MediaCodec.decodeImage(bos.toByteArray)
    assert((w, h, r, g, b) === ((5, 4, er, eg, eb)))
    // undecodable payloads fail loudly, not as silent nulls
    intercept[IllegalArgumentException] {
      Multimodal.MediaCodec.decodeImage("not an image".getBytes)
    }
  }

  test("decodeAudio: real WAV roundtrip reproduces exact sample sums") {
    // in-memory ground truth independent of the committed fixtures
    val (rate, ch, frames) = (11025, 2, 123)
    val pcm = new Array[Byte](frames * ch * 2)
    var (es, eq) = (0L, 0L)
    var k = 0
    for (f <- 0 until frames; c <- 0 until ch) {
      val s = ((f * 41 + c * 13) % 1499) - 700
      es += s; eq += s.toLong * s
      pcm(k) = (s & 0xff).toByte; pcm(k + 1) = ((s >> 8) & 0xff).toByte
      k += 2
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, ch, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val (r, c2, fr, sum, sq) = Multimodal.MediaCodec.decodeAudio(bos.toByteArray)
    assert((r, c2, fr, sum, sq) === ((rate, ch, frames.toLong, es, eq)))
    // non-WAV payloads fail loudly, not as silent nulls
    intercept[Exception] {
      Multimodal.MediaCodec.decodeAudio("not audio".getBytes)
    }
    // 8-bit PCM is outside the decode contract: loud failure, not a
    // silently wrong sample walk
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val bos8 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](64)), fmt8, 64L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos8)
    intercept[IllegalArgumentException] {
      Multimodal.MediaCodec.decodeAudio(bos8.toByteArray)
    }
  }

  test("decodeVideo: real multi-frame GIF roundtrip reproduces exact per-frame sums") {
    // in-memory ground truth with formulas DIFFERENT from the fixtures
    val (w, h, frames) = (9, 7, 5)
    val (pr, pg, pb) = (new Array[Byte](256), new Array[Byte](256), new Array[Byte](256))
    (0 until 256).foreach { p =>
      pr(p) = ((p * 3) % 256).toByte; pg(p) = p.toByte; pb(p) = ((p * 11) % 256).toByte
    }
    val cm = new java.awt.image.IndexColorModel(8, 256, pr, pg, pb)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    wr.setOutput(ios); wr.prepareWriteSequence(null)
    val expect = Array.fill(frames)(Array(0L, 0L, 0L))
    (0 until frames).foreach { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      for (x <- 0 until w; y <- 0 until h) {
        val p = (x * 29 + y * 31 + f * 37) % 256
        img.getRaster.setSample(x, y, 0, p)
        expect(f)(0) += (p * 3) % 256; expect(f)(1) += p; expect(f)(2) += (p * 11) % 256
      }
      wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    wr.endWriteSequence(); wr.dispose(); ios.close()
    val got = Multimodal.MediaCodec.decodeVideo(bos.toByteArray)
    assert(got.length === frames)
    got.foreach { case (f, gw, gh, r, g, b) =>
      assert((gw, gh) === ((w, h)), s"frame $f dims")
      assert((r, g, b) === ((expect(f)(0), expect(f)(1), expect(f)(2))), s"frame $f sums")
    }
    // non-GIF containers and garbage fail loudly, not as silent nulls
    intercept[IllegalArgumentException] {
      Multimodal.MediaCodec.decodeVideo("not a video".getBytes)
    }
    val png = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB), "png", png)
    intercept[IllegalArgumentException] {
      Multimodal.MediaCodec.decodeVideo(png.toByteArray)
    }
  }

  test("decodeFeatures: mapPartitions stage is deterministic and typed") {
    import spark.implicits._
    val media = Multimodal.media(spark, SparkT.Sf0001).limit(10)
      .as[Multimodal.MediaRow]
    val f1 = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length === 10)
    f1.zip(f2).foreach { case (x, y) =>
      assert(x.media_id === y.media_id)
      assert(x.feature.toSeq === y.feature.toSeq)  // codec stub is deterministic
      assert(x.feature.length === 8)
      assert(x.width >= 32 && x.height >= 32)
      assert(x.n_bytes > 0)
    }
  }
}
