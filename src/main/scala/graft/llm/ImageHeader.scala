package graft.llm

/** Pure-JVM image container header parsing — no native codecs.
  *
  * Parses (width, height, channels) from real PNG, JPEG, and GIF
  * bytes. This is the honest "metadata decode" tier of the multimodal
  * pipeline: dimensions and channel count come from the actual
  * container header, while pixel decoding (the part that needs a
  * codec library) remains behind [[MultimodalOps.FakeDecoder]].
  * Header-only parsing is also what a 100 TB scan wants for
  * filter/stats passes — O(header) per blob, no decompression.
  *
  * Formats, from their public specifications:
  *  - PNG (RFC 2083): 8-byte signature, IHDR chunk fixed at offset 8 —
  *    width/height big-endian at 16/20, color type at 25 mapping to
  *    channels (0 grey→1, 2 RGB→3, 3 palette→1, 4 grey+α→2, 6 RGBA→4).
  *  - JPEG (ITU T.81): FF D8 then marker segments; the SOFn frame
  *    header carries height/width (big-endian) and component count.
  *  - GIF (GIF89a spec): "GIF8" signature, logical-screen
  *    width/height little-endian at 6/8, palette RGB → 3 channels.
  */
object ImageHeader {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def parsePng(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (b.length < 26 || !b.startsWith(PngSig)) None
    else {
      val channels = (b(25) & 0xff) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return None
      }
      Some((be32(b, 16), be32(b, 20), channels))
    }

  /** SOF markers carrying frame dimensions: C0–CF except C4 (DHT),
    * C8 (JPG extension), CC (DAC).
    */
  private def isSof(marker: Int): Boolean =
    marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc

  private def parseJpeg(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // desynced — not a marker
      // fill bytes: a marker may be preceded by any number of FFs
      while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
      if (i + 1 >= b.length) return None
      val marker = b(i + 1) & 0xff
      if (isSof(marker)) {
        if (i + 9 >= b.length) return None
        return Some((be16(b, i + 7), be16(b, i + 5), b(i + 9) & 0xff))
      } else if (marker == 0xd8 || marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone marker, no length field
      } else {
        if (i + 3 >= b.length) return None
        i += 2 + be16(b, i + 2)
      }
    }
    None
  }

  private def parseGif(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (b.length < 10 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8') None
    else Some((le16(b, 6), le16(b, 8), 3))

  /** (width, height, channels) if `b` is a recognized image container. */
  def parse(b: Array[Byte]): Option[(Int, Int, Int)] =
    parsePng(b).orElse(parseJpeg(b)).orElse(parseGif(b))
}
