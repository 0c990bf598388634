package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract /
  * frame-sample run as **batched partition transforms** (the Scala analog of
  * a Pandas-UDF `mapInPandas`: fixed-size record batches through a
  * vectorizable kernel).
  *
  * The container ships no codec libraries, so [[StubCodec]] is a
  * clearly-marked deterministic fake standing in for the real
  * decoder — the Spark-side contract (schema, batching, partitioning,
  * output shape) is real and tested, and a production codec drops into
  * the same `decode` signature.
  */
object Multimodal {

  /** One media record: payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int,
      duration_ms: Long
  )

  /** Extracted features per record. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      sha256_hex: String,
      decoded_width: Int,
      decoded_height: Int,
      n_frames_sampled: Int,
      byte_histogram: Array[Long] // 16-bucket byte-value histogram
  )

  /** STUB CODEC — deterministic fake decode. A real build replaces this
    * object with JNI/javacpp bindings; signatures are the contract. */
  object StubCodec {
    /** "Decode" dimensions from content bytes (deterministic fake). */
    def decodeDims(payload: Array[Byte]): (Int, Int) = {
      val n = payload.length
      (32 + n % 480, 32 + (n * 7) % 480)
    }

    /** Sample up to `maxFrames` frame offsets, evenly spaced (real decoder
      * would seek keyframes; offsets here are byte positions). */
    def sampleFrameOffsets(payload: Array[Byte], maxFrames: Int): Seq[Int] = {
      val n = payload.length
      if (n == 0) Seq.empty
      else (0 until math.min(maxFrames, n)).map(i => (i.toLong * n / math.min(maxFrames, n)).toInt)
    }

    /** "Resample" a payload to a target pixel budget (deterministic fake:
      * evenly-strided byte subsample to w*h/16 bytes — a real codec decodes,
      * scales, re-encodes; the output-size-∝-target contract is what the
      * pipeline depends on). */
    def resample(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
      val n = payload.length
      // Pixel budget in Long: Int targetW*targetH overflows near 46341².
      val outLen = math.min(n.toLong, math.max(1L, targetW.toLong * targetH / 16)).toInt
      if (n == 0) payload
      else Array.tabulate(outLen)(i => payload((i.toLong * n / outLen).toInt))
    }
  }

  val BatchSize = 256

  /** Feature extraction as a batched mapPartitions: records stream through
    * in fixed-size batches (the Pandas-UDF batch shape), one codec context
    * per batch. Partition-parallel, no shuffle. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { iter =>
      iter.grouped(BatchSize).flatMap { batch =>
        // per-batch context (real codec: decoder instance reuse)
        val md = MessageDigest.getInstance("SHA-256")
        batch.map { r =>
          md.reset()
          val digest = md.digest(r.payload).map("%02x".format(_)).mkString
          val (w, h) = StubCodec.decodeDims(r.payload)
          val frames = if (r.kind == "video") StubCodec.sampleFrameOffsets(r.payload, 8) else Seq.empty
          val hist = new Array[Long](16)
          r.payload.foreach(b => hist((b & 0xff) >> 4) += 1)
          MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, digest, w, h, frames.size, hist)
        }
      }
    }
  }

  /** Resized media record produced by [[resize]]. */
  final case class ResizedMedia(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      width: Int,
      height: Int)

  /** Resize every payload to a target resolution — same batched
    * partition-transform shape as [[extractFeatures]] (one codec context
    * per batch, no shuffle); the stub resample stands in for the real
    * decode→scale→encode kernel. */
  def resize(ds: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { iter =>
      iter.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          ResizedMedia(r.media_id, r.kind, StubCodec.resample(r.payload, targetW, targetH),
            targetW, targetH)
        }
      }
    }
  }

  /** One sampled frame: the row-per-frame shape a video pipeline feeds to
    * a downstream image encoder. */
  final case class SampledFrame(
      media_id: Long,
      frame_idx: Int,
      byte_offset: Long,
      frame_bytes: Array[Byte])

  /** Frame sampling as a ROW-EXPANDING batched partition transform (the
    * flatMap sibling of [[extractFeatures]]'s 1:1 map): every video record
    * yields up to `maxFrames` evenly-spaced frames, each a `frameBytes`
    * slice at the stub codec's offset (a real decoder seeks keyframes and
    * emits encoded frames through the same signature). Non-video records
    * yield nothing. Partition-parallel, no shuffle; downstream per-frame
    * work (encode, embed, dedup) starts from exactly this schema. */
  def sampleFrames(
      ds: Dataset[MediaRecord],
      maxFrames: Int = 8,
      frameBytes: Int = 64): Dataset[SampledFrame] = {
    import ds.sparkSession.implicits._
    // No grouped(BatchSize) here: unlike extractFeatures there is no
    // per-batch codec context to amortize, and batching would only pin up
    // to 256 full video payloads in memory at once. Record-at-a-time keeps
    // the buffering O(1 payload).
    ds.mapPartitions { iter =>
      iter.filter(_.kind == "video").flatMap { r =>
        StubCodec.sampleFrameOffsets(r.payload, maxFrames).zipWithIndex.map {
          case (off, i) =>
            val end = math.min(off + frameBytes, r.payload.length)
            SampledFrame(r.media_id, i, off.toLong, r.payload.slice(off, end))
        }
      }
    }
  }

  /** Wrap any table with a binary payload column into MediaRecords (schema
    * adapter used by tests and the q31 catalog query). */
  def fromBinaryColumn(df: DataFrame, idCol: String, payloadCol: String, kind: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("payload"),
      lit("stub").as("format"),
      lit(0).as("width"),
      lit(0).as("height"),
      lit(0L).as("duration_ms")
    ).as[MediaRecord]
  }
}
