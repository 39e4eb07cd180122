/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata alongside.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB — but everything Spark-side is real
  * and tested: the schema (binary payload + struct metadata), the
  * partition-parallel batch shape (`mapPartitions` over iterators, the
  * Scala analogue of `mapInPandas` batches), and the expression-level
  * metadata math that the DuckDB oracle checks.
  *
  * At 100 TB the pattern matters more than the kernel: payloads never hit
  * the driver, decode is a narrow map (no shuffle), and column pruning
  * still works because metadata lives in ordinary top-level columns.
  */
package graft.operators

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

  /** Batch "decode" over partitions — the real-decoder seam. Iterator in,
    * iterator out: constant memory per task, arbitrarily many partitions.
    * STUB kernel: derives 8 deterministic pseudo-features from the bytes;
    * a production build swaps `fakeDecode` for a codec call, nothing else
    * changes. */
  def decodePartitions(spark: SparkSession, df: DataFrame,
      idCol: String): Dataset[DecodedMedia] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }

  /** STUB for the codec: deterministic features from byte content. */
  private[graft] def fakeDecode(id: Long, bytes: Array[Byte]): DecodedMedia = {
    val n = bytes.length
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
    * never on the driver. STUB kernel: a real build decodes, resamples,
    * and re-encodes; here the byte stream is deterministically
    * down-sampled to width*height/64 bytes so output size scales with the
    * requested dims and tests can assert the batch shape. */
  def resizePartitions(spark: SparkSession, df: DataFrame, idCol: String,
      width: Int, height: Int): Dataset[ResizedImage] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val out =
          if (bytes.isEmpty) Array.emptyByteArray // empty payload: no crash
          else {
            val targetLen = math.max(1, width * height / 64)
            Array.tabulate(math.min(targetLen, bytes.length)) {
              i => bytes((i.toLong * bytes.length / targetLen).toInt % bytes.length)
            }
          }
        ResizedImage(id, width, height, out) // NOT a real resampler (???)
      })
  }

  /** One sampled video frame: every `stride`-th block of the payload
    * stands in for a decoded frame. */
  case class SampledFrame(doc_id: Long, frame_idx: Int, offset: Long,
      frame: Array[Byte])

  /** Frame sampling over partitions — flatMap seam (one payload → many
    * frames). STUB kernel: fixed-size byte blocks stand in for decoded
    * frames; a production build swaps in a demuxer, the Spark shape
    * (schema, partitioning, iterator discipline) is unchanged. */
  def sampleFramesPartitions(spark: SparkSession, df: DataFrame,
      idCol: String, frameBytes: Int = 1024,
      everyNth: Int = 4): Dataset[SampledFrame] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val nFrames = math.max(1, bytes.length / frameBytes)
        (0 until nFrames by everyNth).map { f =>
          val off = f.toLong * frameBytes
          SampledFrame(id, f, off,
            bytes.slice(off.toInt, math.min(off.toInt + frameBytes, bytes.length)))
        }
      })
  }
}
