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

  /** Real header decode for PNG/GIF/BMP/JPEG payloads — pure byte parsing,
    * no imaging libraries (dimensions live in fixed header fields / SOF
    * segments). Non-image payloads fall back to the deterministic stub
    * arithmetic (the stand-in for audio/video decoders that would need
    * native libs not present in this environment). */
  private def decode(b: MediaBlob): MediaMeta = {
    ImageHeaders.parse(b.data) match {
      case Some((mediaType, w, h)) =>
        MediaMeta(b.doc_id, mediaType, b.data.length.toLong, w, h, 1)
      case None => decodeStub(b)
    }
  }

  /** STUB decoder for non-image payloads: deterministic arithmetic standing
    * in for decoders whose native libs aren't in this container. */
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
      // per-partition decoder scope: a native decoder handle would be
      // created HERE once and reused across the iterator
      it.map(decode)
    }
  }

  /** Deterministic per-payload features (REAL computation, not a stub):
    * code-point count/sum/distinct plus a position-weighted rolling
    * checksum — the shape a learned feature extractor would emit, computed
    * exactly so the oracle reproduces it. */
  final case class MediaFeatures(doc_id: Long, n_cp: Long, sum_cp: Long,
                                 n_distinct_cp: Long, wsum: Long)

  /** Feature extraction through the same partition-wise decode path as
    * [[extractMeta]]: one extractor instance per partition, streaming over
    * the iterator. Exact integer arithmetic (mod 1e9+7 applied per step ==
    * applied once, since (a+b) mod m == ((a mod m)+b) mod m). */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        // null payload == empty payload (zeros row, like the oracle's
        // LEFT JOIN + coalesce — not a task crash)
        val s = if (b.data == null) ""
                else new String(b.data, java.nio.charset.StandardCharsets.UTF_8)
        var i = 0; var n = 0L; var sum = 0L; var w = 0L
        val seen = new java.util.HashSet[Int]()
        while (i < s.length) {
          val cp = s.codePointAt(i)
          n += 1; sum += cp; seen.add(cp)
          w = (w + n * cp) % 1000000007L
          i += Character.charCount(cp)
        }
        MediaFeatures(b.doc_id, n, sum, seen.size.toLong, w)
      }
    }
  }

  /** A resized payload (decode -> scale -> re-encode in a real pipeline). */
  final case class MediaResized(doc_id: Long, media_type: String,
                                width: Int, height: Int, n_bytes_in: Long,
                                n_bytes_out: Long)

  /** Resize plumbing: partition-wise transform to a fixed target size. The
    * scaler is a STUB (no imaging libs here) — real are the typed Dataset
    * boundary, the per-partition transformer scope, and the deterministic
    * output contract (`n_bytes_out` = stub arithmetic a real encoder would
    * replace). */
  def resize(blobs: Dataset[MediaBlob], width: Int, height: Int): Dataset[MediaResized] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      // per-partition scaler scope (native resize context goes here)
      it.map { b =>
        val n = b.data.length.toLong
        MediaResized(b.doc_id, b.media_type, width, height, n,
                     math.min(n, width.toLong * height))
      }
    }
  }

  /** Frame sampling: k frame indices spread evenly over [0, n_frames), one
    * output row per sampled frame (the explode shape a video pipeline
    * feeds to per-frame feature extraction). Pure integer arithmetic over
    * the decoded frame count — fully deterministic, so even this stubbed
    * path is oracle-checkable. `frame_key` is the md5 lineage key a real
    * pipeline would use to address extracted frame artifacts. */
  def sampleFrames(meta: Dataset[MediaMeta], k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = meta.sparkSession
    import spark.implicits._
    val kk = least(lit(k), $"n_frames")
    meta.toDF()
      // when-guard: n_frames=0 must emit NO rows — a bare sequence(0, -1)
      // would produce the DESCENDING array [0, -1]; explode drops the null
      .select($"doc_id", $"n_frames",
              explode(when(kk > 0, sequence(lit(0), kk - 1)))
                .as("sample_ord"))
      .select($"doc_id", $"sample_ord",
        // integer DIV keeps both engines exact (a double divide + cast
        // would round differently: DuckDB CAST(x AS INT) rounds, Spark
        // truncates)
        expr(s"CAST((sample_ord * (n_frames - 1)) DIV ${math.max(k - 1, 1)} AS INT)")
          .as("frame_idx"))
      .withColumn("frame_key",
        md5(concat($"doc_id".cast("string"), lit("|"),
                   $"frame_idx".cast("string"))))
  }
}

/** Image-container header parsers: dimensions from fixed header fields,
  * pure JVM byte inspection. */
object ImageHeaders {

  private def be32(d: Array[Byte], o: Int): Int =
    ((d(o) & 0xff) << 24) | ((d(o + 1) & 0xff) << 16) |
      ((d(o + 2) & 0xff) << 8) | (d(o + 3) & 0xff)
  private def le32(d: Array[Byte], o: Int): Int =
    (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8) |
      ((d(o + 2) & 0xff) << 16) | ((d(o + 3) & 0xff) << 24)
  private def be16(d: Array[Byte], o: Int): Int =
    ((d(o) & 0xff) << 8) | (d(o + 1) & 0xff)
  private def le16(d: Array[Byte], o: Int): Int =
    (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)

  /** (media_type, width, height) when the payload is a recognized image. */
  def parse(d: Array[Byte]): Option[(String, Int, Int)] = {
    if (d.length >= 24 &&
        d(0) == 0x89.toByte && d(1) == 'P' && d(2) == 'N' && d(3) == 'G')
      Some(("image/png", be32(d, 16), be32(d, 20)))
    // 'GIF'/'BM' are ordinary text prefixes ("GIFs are...", "BMW...") —
    // require the full GIF version signature / a known DIB header size so
    // text payloads never misparse as images
    else if (d.length >= 10 && d(0) == 'G' && d(1) == 'I' && d(2) == 'F' &&
             d(3) == '8' && (d(4) == '7' || d(4) == '9') && d(5) == 'a')
      Some(("image/gif", le16(d, 6), le16(d, 8)))
    else if (d.length >= 26 && d(0) == 'B' && d(1) == 'M' &&
             Set(12, 40, 52, 56, 64, 108, 124).contains(le32(d, 14)))
      Some(("image/bmp", le32(d, 18), math.abs(le32(d, 22))))
    else if (d.length >= 4 && d(0) == 0xff.toByte && d(1) == 0xd8.toByte)
      parseJpeg(d).map { case (w, h) => ("image/jpeg", w, h) }
    else None
  }

  /** Walk JPEG segments to the first SOFn frame header. */
  private def parseJpeg(d: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 9 < d.length) {
      if (d(i) != 0xff.toByte) return None
      val marker = d(i + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
      else if (marker == 0x01 || marker == 0xff) i += 2
      else {
        val len = be16(d, i + 2)
        val isSof = (marker >= 0xc0 && marker <= 0xcf) &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof)
          return Some((be16(d, i + 7), be16(d, i + 5))) // (width, height)
        if (len < 2) return None
        i += 2 + len
      }
    }
    None
  }
}
