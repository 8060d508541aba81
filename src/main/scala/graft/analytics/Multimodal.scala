package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed partition-wise.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * libraries in this environment) — what is real and tested is the Spark
  * plumbing: the binary column schema, the typed Dataset boundary, the
  * partition-wise batch shape (`mapPartitions`, one decoder instance per
  * partition — exactly where a JNI/FFmpeg/JPEG decoder handle would be
  * initialized once and reused), and the deterministic metadata contract.
  */
object Multimodal {

  /** One opaque media blob + lineage. */
  final case class MediaBlob(doc_id: Long, media_type: String, data: Array[Byte])

  /** Extracted metadata/features (what a real decoder would emit). */
  final case class MediaMeta(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB decoder: deterministic arithmetic on the byte payload standing in
    * for a real image/audio decode. Replace the body with the real decoder;
    * the signature and batch shape are the production contract. */
  private def decodeStub(b: MediaBlob): MediaMeta = {
    val n = b.data.length.toLong
    MediaMeta(
      doc_id = b.doc_id,
      media_type = b.media_type,
      n_bytes = n,
      width = (n % 64L).toInt * 10 + 32,
      height = (n % 48L).toInt * 10 + 32,
      n_frames = (n % 24L).toInt + 1)
  }

  /** Binary-column ingestion: treat a string column as the opaque payload
    * (stands in for `spark.read.format("binaryFile")` content). */
  def asBlobs(docs: DataFrame, idCol: String, payloadCol: String): Dataset[MediaBlob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("image/stub").as("media_type"),
      col(payloadCol).cast("binary").as("data")).as[MediaBlob]
  }

  /** Partition-wise decode: one decoder per partition, streaming over the
    * iterator (never materializes the partition). */
  def extractMeta(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      // real decoder handle would be created HERE, once per partition
      it.map(decodeStub)
    }
  }
}
