package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM round-trip checks for the multimodal codec helpers: the
  * closed-form generators must survive a real encode→decode cycle
  * bit-exactly, frame-for-frame — the property the mm02/mm03/mm04 hash
  * gates rely on.
  */
class MultimodalCodecSpec extends AnyFunSuite {

  test("syntheticGif round-trips frame count, dimensions, and every pixel") {
    for (id <- Seq(0L, 1L, 7L, 42L, 255L, 1000L)) {
      val payload = MultimodalQueries.syntheticGif(id)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      reader.setInput(iis)
      val k = reader.getNumImages(true)
      assert(k === (2 + id % 3).toInt, s"frame count for id=$id")
      val w = 6 + (id % 10).toInt
      val h = 6 + ((id * 3) % 10).toInt
      for (f <- 0 until k) {
        val img = reader.read(f)
        assert(img.getWidth === w, s"width id=$id frame=$f")
        assert(img.getHeight === h, s"height id=$id frame=$f")
        for (y <- 0 until h; x <- 0 until w) {
          val got = (img.getRGB(x, y) >> 16) & 0xFF
          val want = ((id + 7L * f + 3L * x + 5L * y) % 256).toInt
          assert(got === want, s"pixel id=$id frame=$f x=$x y=$y")
        }
      }
      reader.dispose()
      iis.close()
    }
  }

  test("syntheticPng round-trips every channel of every pixel") {
    val id = 42L
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MultimodalQueries.syntheticPng(id)))
    val w = 8 + (id % 24).toInt
    val h = 8 + ((id * 7) % 24).toInt
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xFF) === ((id + 3L * x + 5L * y) % 256).toInt)
      assert(((rgb >> 8) & 0xFF) === ((2L * id + 7L * x + 11L * y) % 256).toInt)
      assert((rgb & 0xFF) === ((3L * id + 13L * x + 17L * y) % 256).toInt)
    }
  }
}
