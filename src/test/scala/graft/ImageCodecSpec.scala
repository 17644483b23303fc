package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.llm.{ImageCodec, MultimodalOps}

/** The real pixel tier: decode, resize, and DCT pHash run on genuine
  * JDK-encoded images. pHash must be invariant-ish under re-encoding
  * and small perturbations, and far for unrelated content — the
  * properties Hamming banding relies on.
  */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  // pixel values stay <= 200 so a +10 brightness shift never clips
  private def gradient(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val v = (x * 200 / w + seed) % 201
      img.setRGB(x, y, (v << 16) | ((y * 200 / h) << 8) | ((v + y) % 201))
    }
    img
  }

  private def noise(w: Int, h: Int, seed: Long): BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rnd.nextInt())
    img
  }

  private def bytes(img: BufferedImage, fmt: String = "png"): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("decode reads real pixels: dimensions, channels, plausible mean luma") {
    val Some((w, h, c, mean)) = ImageCodec.decode(bytes(gradient(40, 30, 0)))
    (w, h, c) shouldBe ((40, 30, 3))
    mean should (be > 10.0 and be < 245.0)
    ImageCodec.decode("not an image".getBytes("UTF-8")) shouldBe None
  }

  test("resizePng really resizes: output decodes to the target geometry") {
    val resized = ImageCodec.resizePng(bytes(gradient(64, 48, 0)), 16, 12).get
    val Some((w, h, _, _)) = ImageCodec.decode(resized)
    (w, h) shouldBe ((16, 12))
  }

  test("pHash: stable under re-encode and small noise, far for unrelated images") {
    val base = gradient(64, 64, 0)
    val h1 = ImageCodec.pHash(bytes(base)).get
    // identical pixels, different lossless container -> identical hash
    ImageCodec.pHash(bytes(base, "bmp")).get shouldBe h1
    // lossy JPEG re-encode of the same image -> near hash (GIF is not
    // tested as "near": 24-bit -> 256-color palette quantization is a
    // structural transform, not a perturbation)
    hamming(ImageCodec.pHash(bytes(base, "jpg")).get, h1) should be <= 6
    // global brightness shift only moves the (skipped) DC term -> near
    val brighter = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 64; y <- 0 until 64) {
      val rgb = base.getRGB(x, y)
      def lift(v: Int) = math.min(255, v + 10)
      brighter.setRGB(x, y,
        (lift((rgb >> 16) & 0xff) << 16) | (lift((rgb >> 8) & 0xff) << 8) | lift(rgb & 0xff))
    }
    hamming(ImageCodec.pHash(bytes(brighter)).get, h1) should be <= 4
    // unrelated noise image -> far
    hamming(ImageCodec.pHash(bytes(noise(64, 64, 7L))).get, h1) should be >= 20
  }

  test("real ops fall back to stubs on non-image blobs, partition-parallel") {
    val png = bytes(gradient(20, 10, 0))
    val txt = "text blob".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, txt)).toDF("doc_id", "blob").repartition(2)

    val metas = MultimodalOps.decodeImages(df, "doc_id", "blob")
      .collect().map(m => m.doc_id -> m).toMap
    (metas(1L).width, metas(1L).height, metas(1L).channels) shouldBe ((20, 10, 3))
    metas(2L) shouldBe MultimodalOps.FakeDecoder.decode(2L, txt)

    val fps = MultimodalOps.pHashImages(df, "doc_id", "blob")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fps(1L) shouldBe ImageCodec.pHash(png).get
    fps(2L) shouldBe graft.functions.ByteClassFingerprint.compute(txt)

    val rs = MultimodalOps.resizeImages(df, "doc_id", "blob", 8, 8)
      .collect().map(r => r.doc_id -> r).toMap
    val Some((rw, rh, _, _)) = ImageCodec.decode(rs(1L).blob)
    (rw, rh) shouldBe ((8, 8))
    rs(2L).blob.length shouldBe 64 // stub subsample path
  }
}
