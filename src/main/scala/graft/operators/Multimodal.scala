/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata alongside.
  *
  * The IMAGE path is real: PNG/JPEG/GIF/BMP payloads are decoded,
  * feature-extracted, and resampled with `javax.imageio` +
  * `java.awt.Graphics2D` (JDK-built-in codecs, headless-safe). The
  * AUDIO path is real too: RIFF/WAVE PCM payloads are decoded with
  * `javax.sound.sampled` (also JDK-built-in) into mono [-1, 1] samples
  * and feature-extracted as temporal amplitude stripes. The VIDEO path
  * is real for RIFF/AVI containers (the one video container a plain
  * RIFF walk can demux without an external codec): [[aviFrameSpans]]
  * splits the `movi` list into per-frame chunks, MJPEG frames then
  * decode through the SAME JDK image path, both for frame sampling and
  * for first-frame feature extraction. Payloads that decode as none of
  * these (e.g. MP4 — its box format needs a real demuxer dependency)
  * fall back to a clearly-marked DETERMINISTIC STUB kernel — and
  * everything Spark-side is identical between the paths: the schema
  * (binary payload + struct metadata), the partition-parallel batch shape
  * (`mapPartitions` over iterators, the Scala analogue of `mapInPandas`
  * batches), and the expression-level metadata math that the DuckDB
  * oracle checks.
  *
  * At 100 TB the pattern matters more than the kernel: payloads never hit
  * the driver, decode is a narrow map (no shuffle), and column pruning
  * still works because metadata lives in ordinary top-level columns.
  */
package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Hashing

object Multimodal {

  /** Attach a binary payload column (here: utf-8 bytes of `text` — in a
    * real pipeline this is the image/audio blob read from parquet). */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Expression-level payload metadata: size, content hash, and fake
    * decoded dimensions derived deterministically from the content hash.
    * All built-in expressions → codegen'd, oracle-checkable. */
  def payloadMeta(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col("doc_id"),
      octet_length(encode(t, "UTF-8")).cast(LongType).as("n_bytes"),
      md5(encode(t, "UTF-8")).as("content_hash"),
      pmod(Hashing.hexLong(t), lit(640L)).as("fake_width"),
      pmod(Hashing.hexLongSeeded(t, 1), lit(480L)).as("fake_height"),
      (octet_length(encode(t, "UTF-8")).cast(LongType) / lit(1024L)
        + 1L).cast(LongType).as("fake_n_frames"))
  }

  /** One decoded media record. `features` stands in for the embedding a
    * real decoder+model would emit. */
  case class DecodedMedia(doc_id: Long, n_bytes: Long, format: String,
      features: Array[Float])

  /** Cheap container sniff (magic bytes) so non-image payloads skip the
    * ImageIO reader-probe entirely — at 100 TB the common case must not
    * pay a failed-decode attempt per row. */
  private[graft] def imageMime(bytes: Array[Byte]): Option[String] =
    if (bytes == null) None
    else if (bytes.length >= 8 &&
      bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
      Some("image/png")
    else if (bytes.length >= 3 &&
      bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte && bytes(2) == 0xFF.toByte)
      Some("image/jpeg")
    else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
      Some("image/gif")
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
      Some("image/bmp")
    else None

  /** Disable ImageIO's default FILE-backed stream cache once per JVM:
    * with it on, every `ImageIO.read(InputStream)` creates, writes, and
    * deletes a temp file — per-row disk I/O in the decode kernel, and a
    * silent total decode failure on a read-only tmpdir. The payloads are
    * already in memory; the memory-cached stream is strictly better. */
  private lazy val imageIoNoCache: Unit = ImageIO.setUseCache(false)

  /** Real image decode via the JDK codec; None when the payload only
    * pretended to be an image (sniff passed, stream corrupt). NonFatal,
    * not just IOException: the JDK JPEG/GIF/BMP readers throw unchecked
    * exceptions (ArrayIndexOutOfBounds, NegativeArraySize, ...) on
    * truncated or fuzzed streams, and at corpus scale payloads whose
    * first bytes mimic an image magic by chance are routine — a decode
    * failure must degrade to the stub kernel, never kill the task. */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    imageMime(bytes).flatMap { _ =>
      imageIoNoCache
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Batch decode over partitions — the real-decoder seam. Iterator in,
    * iterator out: constant memory per task, arbitrarily many partitions.
    * PNG/JPEG/GIF/BMP payloads decode for real (`javax.imageio`) and
    * emit 8 luminance-stripe features from actual pixels; RIFF/WAVE
    * payloads decode for real too (`javax.sound.sampled`, JDK-native
    * PCM) and emit 8 temporal-stripe amplitude features; anything else
    * (video — no demuxer in this container) falls back to the
    * deterministic STUB kernel [[fakeDecode]]. A production build adds
    * codec branches next to these; the Spark shape never changes. */
  def decodePartitions(spark: SparkSession, df: DataFrame,
      idCol: String): Dataset[DecodedMedia] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeImage(bytes) match {
            case Some(img) => imageDecode(id, bytes, img)
            case None => decodeWavSamples(bytes) match {
              case Some(samples) => audioDecode(id, bytes, samples)
              case None => videoKeyFrame(bytes) match {
                case Some(img) => DecodedMedia(id, bytes.length.toLong,
                  "video/x-msvideo", lumaStripes(img))
                case None => fakeDecode(id, bytes)
              }
            }
          }
        }
      }
  }

  /** Container sniff for RIFF/AVI — same cheap-gate contract as
    * [[imageMime]]/[[isWav]]. */
  private[graft] def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

  /** Real AVI demux — a plain RIFF chunk walk, no codec dependency:
    * chunks are `fourcc | u32-LE size | data` padded to even length,
    * `LIST` chunks nest (list type in the first 4 data bytes), video
    * frames are the `##dc`/`##db` chunks inside the `movi` list (and its
    * `rec ` sub-lists). Returns each frame's (offset, length) span in
    * stream order. Truncated or lying sizes stop the walk at whatever
    * parsed cleanly — dirty data degrades, never kills the task. */
  private[graft] def aviFrameSpans(bytes: Array[Byte]): Array[(Long, Int)] = {
    if (!isAvi(bytes)) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | (bytes(off + 1) & 0xffL) << 8 |
        (bytes(off + 2) & 0xffL) << 16 | (bytes(off + 3) & 0xffL) << 24
    def isFrameId(off: Int): Boolean = {
      val a = bytes(off).toChar; val b = bytes(off + 1).toChar
      val c = bytes(off + 2).toChar; val d = bytes(off + 3).toChar
      a.isDigit && b.isDigit && (c == 'd' && (d == 'c' || d == 'b'))
    }
    def isList(off: Int): Boolean =
      bytes(off) == 'L' && bytes(off + 1) == 'I' &&
        bytes(off + 2) == 'S' && bytes(off + 3) == 'T'
    def listType(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    def walk(start: Long, end: Long, inMovi: Boolean, depth: Int): Unit = {
      // real AVIs nest LISTs 2-3 deep (hdrl/strl, movi/rec); a hostile
      // payload of thousands of nested 12-byte LIST headers would
      // otherwise recurse into a StackOverflowError — an Error, which no
      // NonFatal guard catches. Past the bound we stop descending:
      // degrade, never kill the task.
      if (depth > 16) return
      var p = start
      while (p + 8 <= end) {
        val size = u32((p + 4).toInt)
        val dataStart = p + 8
        val dataEnd = dataStart + size
        if (dataEnd > end) return // truncated/lying size: keep what parsed
        if (isList(p.toInt) && size >= 4) {
          val lt = listType(dataStart.toInt)
          walk(dataStart + 4, dataEnd,
            lt == "movi" || (inMovi && lt == "rec "), depth + 1)
        } else if (inMovi && size > 0 && isFrameId(p.toInt))
          out += ((dataStart, size.toInt))
        p = dataEnd + (size & 1) // chunks pad to even offsets
      }
    }
    walk(12L, bytes.length.toLong, inMovi = false, depth = 0)
    out.toArray
  }

  /** First decodable video frame (MJPEG frames are plain JPEGs, so the
    * JDK image path applies). Probes a bounded prefix of the frame list:
    * a corrupt stream must not pay |frames| failed decodes. */
  private[graft] def videoKeyFrame(bytes: Array[Byte]): Option[BufferedImage] =
    aviFrameSpans(bytes).iterator.take(8).flatMap { case (off, len) =>
      decodeImage(java.util.Arrays.copyOfRange(
        bytes, off.toInt, off.toInt + len))
    }.nextOption()

  /** Container sniff for RIFF/WAVE — like [[imageMime]], the common
    * non-audio case must not pay a failed parser probe per row. */
  private[graft] def isWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Real WAV/PCM decode via the JDK (`javax.sound.sampled` — no
    * external codec needed): parses the RIFF container, reads the PCM
    * frames, averages channels to mono, and normalizes samples to
    * [-1, 1]. Returns None when the payload only pretended to be a WAV
    * (sniff passed, stream truncated/corrupt) or uses a compressed
    * encoding the JDK can't stream — same degrade-to-stub contract as
    * [[decodeImage]], NonFatal for the same reason (container parsers
    * throw unchecked on fuzzed input). */
  private[graft] def decodeWavSamples(bytes: Array[Byte]): Option[Array[Double]] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (!isWav(bytes)) return None
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        if ((enc != AudioFormat.Encoding.PCM_SIGNED &&
            enc != AudioFormat.Encoding.PCM_UNSIGNED) ||
          (bits != 8 && bits != 16 && bits != 24 && bits != 32)) return None
        val data = in.readAllBytes()
        val bytesPerSample = bits / 8
        val channels = fmt.getChannels
        val frameBytes = bytesPerSample * channels
        val nFrames = data.length / frameBytes
        if (nFrames == 0) return None
        val signed = enc == AudioFormat.Encoding.PCM_SIGNED
        val big = fmt.isBigEndian
        val full = 1L << (bits - 1) // normalizer: |min signed value|
        val out = new Array[Double](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0.0
          var c = 0
          while (c < channels) {
            val off = f * frameBytes + c * bytesPerSample
            var v = 0L
            var i = 0
            while (i < bytesPerSample) {
              val b = data(off + (if (big) i else bytesPerSample - 1 - i)) & 0xffL
              v = (v << 8) | b
              i += 1
            }
            // sign-extend (signed PCM) or re-center (unsigned PCM)
            val s =
              if (signed) (v << (64 - bits)) >> (64 - bits)
              else v - full
            acc += s.toDouble / full
            c += 1
          }
          out(f) = acc / channels
          f += 1
        }
        Some(out)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real audio kernel: 8 features = mean absolute amplitude of 8
    * temporal stripes, in [0, 1] — the audio twin of the image
    * luminance stripes (deterministic, duration-independent-ish,
    * computed from actually decoded samples). */
  private[graft] def audioDecode(id: Long, bytes: Array[Byte],
      samples: Array[Double]): DecodedMedia = {
    val n = samples.length
    val sums = new Array[Double](8)
    val counts = new Array[Long](8)
    var i = 0
    while (i < n) {
      val stripe = (i.toLong * 8 / n).toInt
      sums(stripe) += math.abs(samples(i)); counts(stripe) += 1
      i += 1
    }
    val feats = Array.tabulate(8)(s =>
      if (counts(s) == 0) 0f else (sums(s) / counts(s)).toFloat)
    DecodedMedia(id, bytes.length.toLong, "audio/wav", feats)
  }

  /** Real image kernel: 8 features = mean luminance of 8 vertical
    * stripes, in [0, 1) — deterministic, resolution-independent-ish, and
    * computed from actual decoded pixels. Shared by the image path and
    * the video first-frame path. */
  private[graft] def lumaStripes(img: BufferedImage): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Double](8)
    val counts = new Array[Long](8)
    // bulk row reads: per-pixel getRGB(x, y) pays a bounds check + color
    // model conversion per call (≈10× slower on palette/grayscale
    // sources); one reused row buffer keeps memory at O(width)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        val stripe = x * 8 / w
        sums(stripe) += lum; counts(stripe) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(8)(i =>
      if (counts(i) == 0) 0f else (sums(i) / counts(i) / 256.0).toFloat)
  }

  private[graft] def imageDecode(id: Long, bytes: Array[Byte],
      img: BufferedImage): DecodedMedia =
    DecodedMedia(id, bytes.length.toLong, imageMime(bytes).get,
      lumaStripes(img))

  /** STUB for the remaining codec gap (non-RIFF video — MP4/MKV box
    * formats need an external demuxer dependency): deterministic
    * features from byte content. Images, WAV audio, and AVI/MJPEG video
    * decode for real above. */
  private[graft] def fakeDecode(id: Long, bytes: Array[Byte]): DecodedMedia = {
    // a NULL payload (e.g. encode of a NULL source column) degrades to
    // the zero-length record — one dirty row must never kill the task
    val n = if (bytes == null) 0 else bytes.length
    val feats = Array.tabulate(8) { i =>
      // cheap rolling checksum per stripe — NOT a real decoder (???)
      var acc = i + 1
      var j = i
      while (j < n) { acc = acc * 31 + (bytes(j) & 0xff); j += 8 }
      (acc & 0xffff).toFloat / 65536f
    }
    DecodedMedia(id, n.toLong, "text/plain", feats)
  }

  /** One resized image record: payload replaced by the (stub-)resized
    * bytes, target dims carried alongside. */
  case class ResizedImage(doc_id: Long, width: Int, height: Int,
      payload: Array[Byte])

  /** Batch image resize over partitions — same seam as
    * [[decodePartitions]]: iterator→iterator, constant memory, payloads
    * never on the driver. Decodable images are REALLY resampled
    * (bilinear `Graphics2D.drawImage`, headless-safe) and re-encoded as
    * PNG; non-image payloads keep the deterministic STUB down-sample so
    * the batch shape stays testable without codecs. */
  def resizePartitions(spark: SparkSession, df: DataFrame, idCol: String,
      width: Int, height: Int): Dataset[ResizedImage] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes0) =>
        val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
        val out = decodeImage(bytes) match {
          case Some(img) => resampleToPng(img, width, height)
          case None =>
            if (bytes.isEmpty) Array.emptyByteArray // empty/null payload: no crash
            else {
              val targetLen = math.max(1, width * height / 64)
              Array.tabulate(math.min(targetLen, bytes.length)) {
                i => bytes((i.toLong * bytes.length / targetLen).toInt % bytes.length)
              } // NOT a real resampler (???) — non-image fallback only
            }
        }
        ResizedImage(id, width, height, out)
      })
  }

  /** Real resample kernel: bilinear scale to (width, height), re-encoded
    * PNG (lossless, always-available JDK writer). */
  private[graft] def resampleToPng(img: BufferedImage,
      width: Int, height: Int): Array[Byte] = {
    val dst = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, width, height, null)
    } finally g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }

  /** One sampled video frame: `frame_idx` is the stream-order frame
    * number, `offset` the frame payload's byte offset in the container,
    * `frame` the frame bytes (a decodable JPEG for MJPEG sources). */
  case class SampledFrame(doc_id: Long, frame_idx: Int, offset: Long,
      frame: Array[Byte])

  /** Frame sampling over partitions — flatMap seam (one payload → many
    * frames). RIFF/AVI payloads demux for REAL ([[aviFrameSpans]] — an
    * MJPEG AVI's sampled frames are then JPEGs [[decodeImage]] decodes);
    * other containers fall back to the STUB kernel (fixed `frameBytes`
    * blocks stand in for frames) so the batch shape stays testable
    * without a codec dependency. A production build adds demuxer
    * branches next to the AVI one; the Spark shape (schema,
    * partitioning, iterator discipline) is unchanged. */
  def sampleFramesPartitions(spark: SparkSession, df: DataFrame,
      idCol: String, frameBytes: Int = 1024,
      everyNth: Int = 4): Dataset[SampledFrame] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes0) =>
        val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
        val spans = aviFrameSpans(bytes)
        if (spans.nonEmpty)
          (0 until spans.length by everyNth).map { f =>
            val (off, len) = spans(f)
            SampledFrame(id, f, off, java.util.Arrays.copyOfRange(
              bytes, off.toInt, off.toInt + len))
          }
        else {
          val nFrames = math.max(1, bytes.length / frameBytes)
          (0 until nFrames by everyNth).map { f =>
            val off = f.toLong * frameBytes
            SampledFrame(id, f, off,
              bytes.slice(off.toInt, math.min(off.toInt + frameBytes, bytes.length)))
          }
        }
      })
  }
}
