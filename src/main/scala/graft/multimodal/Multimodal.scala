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

final case class AudioFeatures(
    media_id: Long,
    sample_rate: Int,
    channels: Int,
    n_samples: Long,
    duration_ms: Long)

/** Multimodal-column processing: decode / feature-extract / resize /
  * frame-sample over binary payloads, implemented as batched
  * `mapPartitions` over a typed Dataset — the Scala-native equivalent of
  * a Pandas-UDF `mapInPandas` stage: rows stream through in bounded
  * batches, the decoder is called per batch, and the output is a typed
  * Dataset the rest of the DataFrame pipeline composes with.
  *
  * IMAGES decode for real through the JDK ([[Codecs.decodeImage]]:
  * ImageIO dims, Graphics2D resize, PNG re-encode — no external
  * libraries). Payloads that are NOT decodable images (and the audio/
  * video kinds, whose codecs the JDK lacks) fall back to
  * [[DecodeStub.decode]]'s deterministic fake dimensions, keeping every
  * stage total and SQL-oracle-checkable on arbitrary binary fixtures;
  * swapping in a real audio/video demuxer is the same one-function
  * change the image path already made.
  *
  * Scale notes: payloads never shuffle — features are extracted in the
  * scan stage and only the (small) feature rows move on. Batch size
  * bounds per-task native-decoder memory, the same role as
  * maxRecordsPerBatch for Arrow.
  */
object Multimodal {

  /** Real JDK image codec. */
  object Codecs {
    import java.awt.image.BufferedImage

    /** Magic-byte sniff (PNG/JPEG/GIF/BMP) before any ImageIO call:
      * `ImageIO.read` on a non-image payload costs SPI scanning and
      * stream setup PER ROW — measured 2.5x on a corpus of non-image
      * binaries. Non-matching payloads skip the codec entirely. */
    private[multimodal] def looksLikeImage(p: Array[Byte]): Boolean =
      p.length >= 8 && (
        (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
        (p(0) == 0xff.toByte && p(1) == 0xd8.toByte) ||            // JPEG
        (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
        (p(0) == 'B' && p(1) == 'M'))                              // BMP

    /** (width, height, 1) when the payload decodes as an image
      * (PNG/JPEG/GIF/BMP), else None. */
    def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int)] =
      if (!looksLikeImage(payload)) None
      else
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
          .map(i => (i.getWidth, i.getHeight, 1))
        catch { case _: java.io.IOException => None }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Deterministic synthetic PNG: pixel (x, y) colored by a hash of
      * (x, y, seed). Fixture generator for the real decode path — dims
      * are recoverable only by actually decoding. */
    def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val h = scala.util.hashing.MurmurHash3.productHash((x, y, seed))
          img.setRGB(x, y, h & 0xffffff)
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }

    /** Real WAV (RIFF/PCM) header parse — the audio formats the JDK can
      * serve without native codecs. Returns (sampleRate, channels,
      * nSampleFrames) or None for non-WAV payloads. Chunk-walks the
      * RIFF container (fmt then data, tolerating other chunks in
      * between), so files with LIST/INFO metadata parse too. */
    def decodeWav(p: Array[Byte]): Option[(Int, Int, Long)] = {
      def ascii(off: Int, s: String): Boolean =
        p.length >= off + s.length && s.indices.forall(i => p(off + i) == s.charAt(i))
      if (!ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
      val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var off = 12
      var rate = -1; var channels = -1; var blockAlign = -1; var dataLen = -1L
      while (off + 8 <= p.length && (rate < 0 || dataLen < 0)) {
        val isFmt = ascii(off, "fmt ")
        val isData = ascii(off, "data")
        val size = bb.getInt(off + 4)
        if (size < 0 || off + 8 + size > p.length) return None
        if (isFmt && size >= 16) {
          channels = bb.getShort(off + 10).toInt
          rate = bb.getInt(off + 12)
          blockAlign = bb.getShort(off + 20).toInt
        }
        if (isData) dataLen = size.toLong
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      if (rate <= 0 || channels <= 0 || blockAlign <= 0 || dataLen < 0) None
      else Some((rate, channels, dataLen / blockAlign))
    }

    /** Deterministic synthetic 16-bit PCM WAV (fixture generator for the
      * real parse path). */
    def syntheticWav(sampleRate: Int, channels: Int, nSamples: Int, seed: Long): Array[Byte] = {
      val dataLen = nSamples * channels * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
      bb.putShort(1); bb.putShort(channels.toShort)
      bb.putInt(sampleRate); bb.putInt(sampleRate * channels * 2)
      bb.putShort((channels * 2).toShort); bb.putShort(16)
      bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
      var i = 0
      while (i < nSamples * channels) {
        bb.putShort((scala.util.hashing.MurmurHash3.productHash((i, seed)) & 0xffff).toShort)
        i += 1
      }
      bb.array()
    }

    /** Real MJPEG-in-AVI demux — the video container a JVM can serve
      * without native codecs: RIFF chunk walk into the 'movi' LIST,
      * collecting compressed-frame chunks ('NNdc'); each frame is then
      * a plain JPEG for [[decodeImage]]. Returns the frame payloads, or
      * None for non-AVI input. */
    def demuxAviFrames(p: Array[Byte]): Option[Seq[Array[Byte]]] = {
      def ascii(off: Int, s: String): Boolean =
        p.length >= off + s.length && s.indices.forall(i => p(off + i) == s.charAt(i))
      if (!ascii(0, "RIFF") || !ascii(8, "AVI ")) return None
      val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val frames = Seq.newBuilder[Array[Byte]]
      var bad = false
      def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
        var off = start
        while (off + 8 <= end && !bad) {
          val size = bb.getInt(off + 4)
          if (size < 0 || off + 8 + size > end) { bad = true; return }
          if (ascii(off, "LIST")) {
            val sub = new String(p, off + 8, 4, "US-ASCII")
            walk(off + 12, off + 8 + size, inMovi || sub == "movi")
          } else if (inMovi && p.length >= off + 4 &&
              p(off + 2) == 'd' && p(off + 3) == 'c') {
            frames += java.util.Arrays.copyOfRange(p, off + 8, off + 8 + size)
          }
          off += 8 + size + (size & 1)
        }
      }
      walk(12, p.length, inMovi = false)
      if (bad) None else Some(frames.result())
    }

    /** Deterministic synthetic MJPEG AVI: JPEG-encoded [[syntheticPng]]-
      * style frames in a structurally-correct container (hdrl with
      * avih/strh/strf, then the movi LIST). */
    def syntheticAvi(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
      val frames = (0 until nFrames).map { f =>
        val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val h = scala.util.hashing.MurmurHash3.productHash((x, y, f, seed))
            img.setRGB(x, y, h & 0xffffff)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(fourcc.getBytes("US-ASCII")); bb.putInt(body.length); bb.put(body)
        bb.array()
      }
      def list(subtype: String, body: Array[Byte]): Array[Byte] =
        chunk("LIST", subtype.getBytes("US-ASCII") ++ body)
      val avih = {
        val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.putInt(33333); b.putInt(0); b.putInt(0); b.putInt(0)
        b.putInt(nFrames); b.putInt(0); b.putInt(1); b.putInt(0)
        b.putInt(width); b.putInt(height); b.array()
      }
      val strh = {
        val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("vids".getBytes("US-ASCII")); b.put("MJPG".getBytes("US-ASCII"))
        b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(1); b.putInt(30)
        b.putInt(0); b.putInt(nFrames); b.array()
      }
      val strf = {
        val b = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.putInt(40); b.putInt(width); b.putInt(height); b.putShort(1)
        b.putShort(24); b.put("MJPG".getBytes("US-ASCII")); b.array()
      }
      val hdrl = list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      val out = java.nio.ByteBuffer.allocate(8 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")); out.putInt(body.length); out.put(body)
      out.array()
    }

    /** Real resize-to-fit: decode, scale so max(w, h) <= maxDim with the
      * SAME integer arithmetic as the stub path (never upscale), render
      * through Graphics2D, re-encode PNG. None when not an image. */
    def resizeImage(payload: Array[Byte], maxDim: Int): Option[(Int, Int, Array[Byte])] =
      if (!looksLikeImage(payload)) None
      else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))).map { src =>
        val (w, h) = (src.getWidth, src.getHeight)
        val m = math.max(w, h)
        val (ow, oh) =
          if (m <= maxDim) (w, h)
          else (math.max(1, w * maxDim / m), math.max(1, h * maxDim / m))
        val dst = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try g.drawImage(src.getScaledInstance(ow, oh, java.awt.Image.SCALE_SMOOTH), 0, 0, null)
        finally g.dispose()
        (ow, oh, encodePng(dst))
      }
      catch { case _: java.io.IOException => None }
  }

  /** 8x8 AVERAGE PERCEPTUAL HASH (aHash) of a decodable image: scale to
    * 8x8, integer luma per pixel (299r+587g+114b, /1000), bit j set iff
    * 64·luma_j STRICTLY exceeds the total — the classic
    * resize/re-encode-robust image fingerprint (near-dup images land
    * within a few bits of hamming distance). Strict >: a constant image
    * hashes to 0. */
  private[graft] def aHashImage(payload: Array[Byte]): Option[Long] = {
    import java.awt.image.BufferedImage
    (if (Codecs.looksLikeImage(payload))
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }
    else None).map { src =>
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try g.drawImage(src.getScaledInstance(8, 8, java.awt.Image.SCALE_SMOOTH), 0, 0, null)
      finally g.dispose()
      val luma = new Array[Long](64)
      var sum = 0L
      var i = 0
      while (i < 64) {
        val rgb = img.getRGB(i % 8, i / 8)
        luma(i) = (((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
          (rgb & 0xff) * 114L) / 1000L
        sum += luma(i)
        i += 1
      }
      var h = 0L
      i = 0
      while (i < 64) { if (luma(i) * 64L > sum) h |= 1L << i; i += 1 }
      h
    }
  }

  /** Byte-domain aHash for non-image payloads: sample 64 bytes at
    * stride n/64 and apply the same above-the-mean rule in exact
    * integer arithmetic (bit j iff 64·b_j > Σb) — any SQL engine can
    * recompute it from the payload's hex rendering, which is what the
    * q129 oracle does. */
  private[graft] def aHashStub(payload: Array[Byte]): Long = {
    val n = payload.length
    if (n == 0) return 0L
    val b = new Array[Long](64)
    var sum = 0L
    var j = 0
    // index computed in Long: j*n overflows Int for payloads past
    // ~34 MB (Int.MaxValue/63) and would throw on a negative index —
    // the q129 oracle computes the same index in BIGINT and succeeds
    while (j < 64) { b(j) = (payload((j.toLong * n / 64).toInt) & 0xff).toLong; sum += b(j); j += 1 }
    var h = 0L
    j = 0
    while (j < 64) { if (b(j) * 64L > sum) h |= 1L << j; j += 1 }
    h
  }

  /** Per-record perceptual hashes: real pixel aHash for decodable
    * images, the byte-domain stub otherwise — (media_id, phash). Same
    * batched dispatch shape as [[extractFeatures]]. */
  def perceptualHashes(media: Dataset[MediaRecord], batchSize: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        val h = (if (r.kind == "image") aHashImage(r.payload) else None)
          .getOrElse(aHashStub(r.payload))
        (r.media_id, h)
      })
    }.toDF("media_id", "phash")
  }

  /** STUB decoder boundary for payloads no JDK codec serves (audio,
    * video, non-image binaries). Signature and batch usage are identical
    * to the real path — a real demuxer swaps in here. */
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

  /** Decode dispatch: real image codec first for `kind == "image"`,
    * deterministic stub otherwise. */
  private def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) =
    (if (kind == "image") Codecs.decodeImage(payload) else None)
      .getOrElse(DecodeStub.decode(payload))

  // table-driven hex: f"$b%02X" allocates a java.util.Formatter PER
  // BYTE — measured 2.4x on the frame-sampling path, whose hot loop
  // hex-renders every chunk before digesting
  private val HexU = "0123456789ABCDEF".toCharArray
  private val HexL = "0123456789abcdef".toCharArray
  private def hexBytes(bytes: Array[Byte], table: Array[Char]): Array[Byte] = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      out(2 * i) = table(v >>> 4).toByte
      out(2 * i + 1) = table(v & 0xf).toByte
      i += 1
    }
    out
  }

  private def hexMd5(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    new String(hexBytes(d, HexL), java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Digest of a byte-slice in the HEX domain: md5 over the uppercase
    * hex rendering of the bytes. Full-payload digests stay raw md5
    * ([[hexMd5]]); slices (resize prefix, frame chunks) use this form
    * because a byte cut can land mid-UTF-8-char, and SQL oracles whose
    * digest functions are VARCHAR-only (DuckDB) can still recompute
    * `md5(substring(hex(payload), ...))` exactly for ANY byte content.
    * Uppercase matches both Spark's and DuckDB's `hex()`. */
  private def sliceDigest(bytes: Array[Byte]): String =
    hexMd5(hexBytes(bytes, HexU))

  /** Batched feature extraction (decode + digest) — the mapInPandas
    * analog. Images get real ImageIO dimensions; everything else (and
    * undecodable payloads) the deterministic stub's. */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a heavier decoder would be initialized once here, fed the batch
        batch.map { r =>
          val (w, h, f) = decode(r.kind, r.payload)
          MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, hexMd5(r.payload), w, h, f)
        }
      }
    }
  }

  /** Batched audio feature extraction: WAV payloads parse for REAL
    * (RIFF/PCM header — sample rate, channels, frame count; the format
    * the JVM serves without native codecs); other audio payloads get
    * deterministic stub features derived from byte stats, keeping the
    * stage total and oracle-checkable on arbitrary binaries. Duration
    * is integer milliseconds (frames * 1000 / rate, floor). */
  def extractAudioFeatures(media: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (rate, channels, frames) = Codecs.decodeWav(r.payload).getOrElse {
            val n = r.payload.length
            (8000 + (n % 5) * 8000, n % 2 + 1, n.toLong) // stub: byte stats
          }
          AudioFeatures(r.media_id, rate, channels, frames,
            if (rate <= 0) 0L else frames * 1000L / rate)
        }
      }
    }
  }

  /** Batched resize-to-fit. Decodable images take the REAL path
    * (Graphics2D scale + PNG re-encode, digest = md5 of the encoded
    * bytes); other payloads keep the stub semantics — dimensions scaled
    * with the same integer arithmetic, the "re-encode" a
    * proportionally-truncated byte prefix, digest in the hex domain
    * (sliceDigest) so SQL oracles stay byte-exact. */
  def resizeToFit(media: Dataset[MediaRecord], maxDim: Int,
      batchSize: Int = 64): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    require(maxDim >= 1)
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val real =
            if (r.kind == "image") Codecs.resizeImage(r.payload, maxDim) else None
          real match {
            case Some((ow, oh, out)) =>
              ResizedMedia(r.media_id, r.kind, ow, oh, out.length.toLong, hexMd5(out))
            case None =>
              val n = r.payload.length
              val (w, h, _) = DecodeStub.decode(r.payload)
              val m = math.max(w, h)
              // n * maxDim in Long: a 20 MB payload at maxDim=128
              // overflows Int and would silently truncate to one byte
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
  }

  /** REAL video frame sampling: demux MJPEG AVI payloads, keep every
    * `stride`-th frame, decode each kept frame's dimensions with the
    * real image codec (1 row in -> n frame rows out). Rows whose payload
    * is not an AVI container yield no frames — byte-slicing pseudo-
    * frames for arbitrary binaries remain available via
    * [[sampleFrames]]. */
  def sampleVideoFrames(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(stride >= 1)
    media.flatMap { r =>
      Codecs.demuxAviFrames(r.payload).getOrElse(Seq.empty)
        .zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .flatMap { case (jpeg, i) =>
          Codecs.decodeImage(jpeg).map { case (w, h, _) =>
            (r.media_id, i, w, h, jpeg.length)
          }
        }
    }.toDF("media_id", "frame_no", "width", "height", "frame_bytes")
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
