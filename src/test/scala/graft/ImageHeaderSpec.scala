package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.llm.{ImageHeader, MultimodalOps}

/** The header parser must read REAL image bytes — encoders here are
  * the JDK's own ImageIO writers, so the fixtures are genuine PNG /
  * JPEG / GIF containers, not hand-rolled byte arrays.
  */
class ImageHeaderSpec extends SparkSpec {
  import spark.implicits._

  private def encode(fmt: String, w: Int, h: Int, imgType: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, imgType)
    // non-constant pixels so JPEG actually emits entropy-coded data
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 97) << 8)
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, out), s"JDK has no $fmt writer")
    out.toByteArray
  }

  test("parses real PNG, JPEG, and GIF headers (dimensions + channels)") {
    ImageHeader.parse(encode("png", 7, 5, BufferedImage.TYPE_INT_RGB)) shouldBe Some((7, 5, 3))
    ImageHeader.parse(encode("png", 3, 9, BufferedImage.TYPE_INT_ARGB)) shouldBe Some((3, 9, 4))
    ImageHeader.parse(encode("png", 4, 4, BufferedImage.TYPE_BYTE_GRAY)) shouldBe Some((4, 4, 1))
    ImageHeader.parse(encode("jpg", 11, 6, BufferedImage.TYPE_INT_RGB)) shouldBe Some((11, 6, 3))
    ImageHeader.parse(encode("jpg", 8, 8, BufferedImage.TYPE_BYTE_GRAY)) shouldBe Some((8, 8, 1))
    ImageHeader.parse(encode("gif", 13, 2, BufferedImage.TYPE_INT_RGB)) shouldBe Some((13, 2, 3))
  }

  test("rejects non-image bytes, truncated headers, and empty blobs") {
    ImageHeader.parse("plain text document".getBytes("UTF-8")) shouldBe None
    ImageHeader.parse(Array.empty[Byte]) shouldBe None
    ImageHeader.parse(encode("png", 7, 5, BufferedImage.TYPE_INT_RGB).take(12)) shouldBe None
    // JPEG SOI with garbage after it
    ImageHeader.parse(Array(0xff, 0xd8, 0x00, 0x11).map(_.toByte)) shouldBe None
  }

  test("decodeBlobs uses real headers for image blobs, fake decode otherwise") {
    val png = encode("png", 7, 5, BufferedImage.TYPE_INT_RGB)
    val jpg = encode("jpg", 11, 6, BufferedImage.TYPE_INT_RGB)
    val txt = "just a text blob".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, jpg), (3L, txt)).toDF("doc_id", "blob")
    val metas = MultimodalOps.decodeBlobs(df, "doc_id", "blob")
      .collect().map(m => m.doc_id -> m).toMap
    (metas(1L).width, metas(1L).height, metas(1L).channels) shouldBe ((7, 5, 3))
    metas(1L).blob_len shouldBe png.length.toLong
    (metas(2L).width, metas(2L).height, metas(2L).channels) shouldBe ((11, 6, 3))
    metas(3L) shouldBe MultimodalOps.FakeDecoder.decode(3L, txt)
  }
}
