package graft.tools

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.File
import javax.imageio.{IIOImage, ImageIO}

import graft.operators.Multimodal

/** One-off generator of the committed multi-frame GIF video fixtures
  * (fixtures/media/video_NN.gif) — run with
  * `sbt "Test/runMain graft.tools.MakeVideoFixtures"`.
  *
  * Video i is Multimodal.videoFrames(i) frames of
  * videoWidth(i)×videoHeight(i), each pixel carrying palette index
  * Multimodal.videoPaletteIndex(i, f, x, y) under the fixed
  * Multimodal.videoPalette color map. Frames use only palette colors,
  * so the GIF encode is LOSSLESS and the q_media_video oracle can
  * recompute every per-frame channel sum from the formulas — ground
  * truth independent of javax.imageio.
  */
object MakeVideoFixtures {
  def main(args: Array[String]): Unit = {
    val dir = new File("fixtures/media")
    dir.mkdirs()
    val (r, g, b) = (new Array[Byte](256), new Array[Byte](256), new Array[Byte](256))
    (0 until 256).foreach { p =>
      val (pr, pg, pb) = Multimodal.videoPalette(p)
      r(p) = pr.toByte; g(p) = pg.toByte; b(p) = pb.toByte
    }
    val cm = new IndexColorModel(8, 256, r, g, b)
    (0 until Multimodal.VideoFixtureCount).foreach { i =>
      val (w, h, frames) =
        (Multimodal.videoWidth(i), Multimodal.videoHeight(i), Multimodal.videoFrames(i))
      val out = new File(dir, f"video_$i%02d.gif")
      val ios = ImageIO.createImageOutputStream(out)
      val wr = ImageIO.getImageWritersByFormatName("gif").next()
      wr.setOutput(ios)
      wr.prepareWriteSequence(null)
      (0 until frames).foreach { f =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
        for (x <- 0 until w; y <- 0 until h)
          img.getRaster.setSample(x, y, 0, Multimodal.videoPaletteIndex(i, f, x, y))
        wr.writeToSequence(new IIOImage(img, null, null), null)
      }
      wr.endWriteSequence()
      wr.dispose()
      ios.close()
      println(s"wrote $out (${out.length} bytes, $frames frames)")
    }
  }
}
