package graft.llm

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}

import javax.sound.sampled.AudioSystem

/** REAL audio codec on the JDK's own WAV support
  * (`javax.sound.sampled` parses RIFF/WAVE PCM pure-JVM, no native
  * deps) — the audio sibling of [[ImageCodec]], and the "swap the stub
  * for a codec" step for the X5 audio path. Helpers are driver-free
  * and stateless, called from `mapPartitions` so a partition pays one
  * class-load, then streams.
  *
  * Scope is mono PCM s16le — the interchange format every
  * speech/ASR preprocessing pipeline normalizes to before feature
  * extraction; compressed codecs (MP3/Opus) need native decoders this
  * container does not ship.
  */
object AudioCodec {

  /** Write a RIFF/WAVE mono PCM s16le blob (44-byte canonical header
    * + little-endian samples).
    */
  def buildWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, "sampleRate must be positive")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Parse through the JDK codec (`AudioSystem.getAudioInputStream`)
    * to (sampleRate, mono s16 samples). None if javax.sound cannot
    * read the stream or the format is not mono PCM s16le.
    */
  def parseWavPcm16(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 || fmt.isBigEndian) None
        else {
          val raw = in.readAllBytes()
          val out = new Array[Short](raw.length / 2)
          var i = 0
          while (i < out.length) {
            out(i) = (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort
            i += 1
          }
          Some((fmt.getSampleRate.toInt, out))
        }
      } finally in.close()
    } catch { case _: Exception => None }
}
