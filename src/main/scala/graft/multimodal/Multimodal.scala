package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: media as an opaque binary column plus typed
  * metadata — the schema pattern for images/audio/video in a
  * training-data pipeline (content stays a blob; structure lives in
  * columns). */
final case class MediaRecord(
    media_id: Long,
    kind: String,               // "image" | "audio" | "video"
    payload: Array[Byte],
    meta: Map[String, String])

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    digest: String,
    width: Int,
    height: Int,
    n_frames: Int)

final case class ResizedMedia(
    media_id: Long,
    kind: String,
    out_w: Int,
    out_h: Int,
    out_bytes: Long,
    out_digest: String)

/** Multimodal-column processing: decode / feature-extract / resize /
  * frame-sample over binary payloads, implemented as batched
  * `mapPartitions` over a typed Dataset — the Scala-native equivalent of
  * a Pandas-UDF `mapInPandas` stage: rows stream through in bounded
  * batches, the decoder is called per batch, and the output is a typed
  * Dataset the rest of the DataFrame pipeline composes with.
  *
  * The actual codec work is STUBBED (no image/audio libraries in this
  * environment): [[DecodeStub.decode]] derives deterministic fake
  * dimensions from the bytes. Everything around it — schema, encoders,
  * partitioning, batch shape, digesting — is real and tested; swapping
  * the stub for javacv/ImageIO is a one-function change.
  *
  * Scale notes: payloads never shuffle — features are extracted in the
  * scan stage and only the (small) feature rows move on. Batch size
  * bounds per-task native-decoder memory, the same role as
  * maxRecordsPerBatch for Arrow.
  */
object Multimodal {

  /** STUB decoder boundary. A real build replaces this body with an
    * actual codec call; signature and batch usage stay identical. */
  object DecodeStub {
    /** Deterministic fake decode: pretend dimensions from byte stats. */
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      val width = (n % 640) + 1
      val height = ((n * 7) % 480) + 1
      val frames = (n % 24) + 1
      (width, height, frames)
    }
  }

  private def hexMd5(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map(b => f"$b%02x").mkString
  }

  /** Digest of a byte-slice in the HEX domain: md5 over the uppercase
    * hex rendering of the bytes. Full-payload digests stay raw md5
    * ([[hexMd5]]); slices (resize prefix, frame chunks) use this form
    * because a byte cut can land mid-UTF-8-char, and SQL oracles whose
    * digest functions are VARCHAR-only (DuckDB) can still recompute
    * `md5(substring(hex(payload), ...))` exactly for ANY byte content.
    * Uppercase matches both Spark's and DuckDB's `hex()`. */
  private def sliceDigest(bytes: Array[Byte]): String =
    hexMd5(bytes.map(b => f"$b%02X").mkString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** Batched feature extraction (decode + digest) — the mapInPandas
    * analog. */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would be initialized once here and fed the batch
        batch.map { r =>
          val (w, h, f) = DecodeStub.decode(r.payload)
          MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, hexMd5(r.payload), w, h, f)
        }
      }
    }
  }

  /** Batched resize-to-fit (stub): scale dimensions so max(w,h) <=
    * maxDim (integer arithmetic, never upscale) and "re-encode" the
    * payload as its proportionally-truncated prefix — a real build
    * swaps the body for an image scaler; batching, schema, and the
    * 1-row-in/1-row-out shape are the real thing. */
  def resizeStub(media: Dataset[MediaRecord], maxDim: Int,
      batchSize: Int = 64): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    require(maxDim >= 1)
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val n = r.payload.length
          val (w, h, _) = DecodeStub.decode(r.payload)
          val m = math.max(w, h)
          // n * maxDim in Long: a 20 MB payload at maxDim=128 overflows
          // Int and would silently truncate the output to one byte
          val (ow, oh, obytes) =
            if (m <= maxDim) (w, h, n)
            else (math.max(1, w * maxDim / m), math.max(1, h * maxDim / m),
              math.max(1L, n.toLong * maxDim / m).toInt)
          val out = r.payload.take(obytes)
          ResizedMedia(r.media_id, r.kind, ow, oh, out.length.toLong, sliceDigest(out))
        }
      }
    }
  }

  /** Frame sampling: every `stride`-th fixed-size slice of the payload —
    * the video-pipeline shape (1 row in -> n frame rows out) without a
    * real demuxer. */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (chunk, i) => (r.media_id, i, chunk.length, sliceDigest(chunk)) }
    }.toDF("media_id", "frame_no", "frame_bytes", "frame_digest")
  }

  /** Wrap any table with a binary-able column as MediaRecords (test/demo
    * adapter; real corpora land in this schema at ingest). */
  def fromTable(df: DataFrame, idCol: String, payloadCol: String, kind: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        lit(kind).as("kind"),
        col(payloadCol).cast("binary").as("payload"),
        map().cast("map<string,string>").as("meta"))
      .as[MediaRecord]
  }
}
