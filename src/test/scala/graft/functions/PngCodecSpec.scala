package graft.functions

import graft.SparkSpec
import graft.functions.Multimodal._

/** The real PNG leg of the multimodal path: JDK ImageIO encode/decode
  * round trips under the deterministic pixel law, per-partition codec
  * init, and loud failure on undecodable bytes. */
class PngCodecSpec extends SparkSpec {
  import spark.implicits._

  test("encode → decode round trips the pixel law exactly") {
    val codec = new PngCodec
    Seq(0L, 7L, 123L).foreach { id =>
      val (w, h) = pngDims(id)
      val img = codec.decode(pngBytes(id))
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRGB(x, y) === pixelArgb(id, x, y),
          s"pixel ($x,$y) of image $id")
    }
  }

  test("undecodable bytes fail loudly, not as null features") {
    val codec = new PngCodec
    val e = intercept[IllegalArgumentException](
      codec.decode("definitely not a png".getBytes("UTF-8")))
    assert(e.getMessage.contains("decodable"))
  }

  test("distributed decode: features match the law on every partition") {
    val media = (0L until 40L).map(id => MediaRecord(id, "png", pngBytes(id)))
      .toDS().repartition(5)
    val feats = decodePngFeatures(media).collect().sortBy(_.id)
    assert(feats.length === 40)
    feats.foreach { f =>
      val (w, h) = pngDims(f.id)
      assert(f.width === w && f.height === h)
      val expSumR = (for (y <- 0 until h; x <- 0 until w)
        yield (31 * f.id + 7 * x + 13 * y) % 256).sum
      assert(f.sum_r === expSumR, s"sum_r of image ${f.id}")
      assert(f.px00 === (pixelArgb(f.id, 0, 0) & 0xFFFFFF))
    }
    val thumbs = pngThumbnails(media).collect()
    assert(thumbs.length === 40 * 16)
    val t = thumbs.find(t => t.id == 9L && t.ty == 3 && t.tx == 2).get
    val (w, h) = pngDims(9L)
    val (sx, sy) = (2 * w / 4, 3 * h / 4)
    val p = pixelArgb(9L, sx, sy)
    assert(t.lum === ((((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3))
  }
}
