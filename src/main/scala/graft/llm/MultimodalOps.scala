package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.8 X5).
  *
  * Media are opaque `BINARY` columns plus typed metadata. The decode
  * step is STUBBED (no image/audio codecs in this environment) with a
  * deterministic fake that parses a pseudo-header from the bytes — the
  * Spark-side plumbing (schema, partition-parallel batch iteration,
  * typed output) is real: swap [[FakeDecoder.decode]] for a JNI/codec
  * call and nothing else changes.
  */
object MultimodalOps {

  /** Typed metadata extracted per media blob. */
  final case class MediaMeta(
      doc_id: Long,
      blob_len: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_byte: Double)

  /** STUB decoder — deterministic pseudo-parse of a media header.
    * Marked clearly as fake: a real implementation decodes the codec
    * header and samples pixels/frames.
    */
  object FakeDecoder {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      val b0 = if (bytes.length > 0) bytes(0) & 0xff else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      var s = 0L
      var i = 0
      while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
      MediaMeta(
        doc_id = id,
        blob_len = bytes.length.toLong,
        width = (b0 * 256 + b1) % 1024,
        height = (b1 * 256 + b0) % 1024,
        channels = 1 + (b0 % 3),
        mean_byte = if (bytes.isEmpty) 0.0 else s.toDouble / bytes.length)
    }
  }

  /** Decode a binary column partition-parallel. `mapPartitions` keeps
    * per-partition batching (one decoder init per partition, not per
    * row) — the Scala analogue of arrow-batched UDF iteration.
    */
  def decodeBlobs(df: DataFrame, idCol: String, blobCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (real codecs are stateful)
        it.map { case (id, bytes) => FakeDecoder.decode(id, Option(bytes).getOrElse(Array.empty)) }
      }
  }

  /** Build the multimodal view of the documents table: text recast as
    * the media blob (the container ships no real media), carrying
    * metadata columns through.
    */
  def documentsAsBlobs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), col(textCol).cast("binary").as("blob"))
}
