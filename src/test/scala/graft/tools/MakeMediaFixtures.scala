package graft.tools

import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO

/** One-off generator of the committed PNG media fixtures
  * (fixtures/media/img_NN.png) — run with
  * `sbt "Test/runMain graft.tools.MakeMediaFixtures"`.
  *
  * Image i is (16+i)×(12+i) with pixel (x, y) colored by the pure
  * integer formulas below. PNG is lossless, so a correct decoder must
  * reproduce the channel sums EXACTLY — the q_media_decode oracle
  * replays the same formulas in SQL, making the decode stage itself
  * hash-checked against ground truth independent of javax.imageio.
  */
object MakeMediaFixtures {
  val NImages: Int = graft.operators.Multimodal.MediaFixtureCount

  def rgb(i: Int, x: Int, y: Int): (Int, Int, Int) = (
    (x * 7 + y * 13 + i * 31) % 256,
    (x * 3 + y * 5 + i * 17) % 256,
    (x * 11 + y * 2 + i * 7) % 256)

  def main(args: Array[String]): Unit = {
    val dir = new File("fixtures/media")
    dir.mkdirs()
    (0 until NImages).foreach { i =>
      val (w, h) = (16 + i, 12 + i)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val (r, g, b) = rgb(i, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val f = new File(dir, f"img_$i%02d.png")
      ImageIO.write(img, "png", f)
      println(s"wrote $f (${f.length} bytes)")
    }
  }
}
