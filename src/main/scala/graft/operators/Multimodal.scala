package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` payload
  * columns with typed metadata, plus partition-batched decode / feature
  * extraction — the Scala analog of Arrow-batched pandas UDFs (`mapInPandas`):
  * data stays columnar up to the partition iterator, the decoder runs
  * iterator→iterator so a partition never fully materializes, and everything
  * around the decode step (schema, partitioning, joins) is ordinary Catalyst.
  *
  * The actual codec libraries are not available in this container, so the
  * decode step is STUBBED: [[StubDecoder]] derives deterministic fake
  * dimensions/brightness from the md5 of the payload bytes. The Spark-side
  * plumbing — binary schema, batch shape, feature join-back — is real and
  * oracle-tested (the fake features are recomputable in SQL from md5(text)).
  * Swap [[MediaDecoder]] for a real JNI/javacv implementation in production.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  final case class ImageFeatures(
      media_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      brightness: Double)

  /** Decoder seam. Implementations must be Serializable — they ship to
    * executors inside the mapPartitions closure. */
  trait MediaDecoder extends Serializable {
    /** Returns (width, height, brightness in [0,1]). */
    def decodeImage(payload: Array[Byte]): (Int, Int, Double)
  }

  /** Deterministic stand-in for a real image codec: features derive from the
    * payload md5, so an oracle can recompute them from the source bytes.
    * A real decoder would parse the container format here (??? in spirit). */
  object StubDecoder extends MediaDecoder {
    override def decodeImage(payload: Array[Byte]): (Int, Int, Double) = {
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(payload)
      val width = Integer.parseInt(hex.substring(0, 4), 16) % 1024 + 1
      val height = Integer.parseInt(hex.substring(4, 8), 16) % 1024 + 1
      val brightness = (Integer.parseInt(hex.substring(8, 12), 16) % 256) / 255.0
      (width, height, brightness)
    }
  }

  /** Build a media table from a text corpus for testing: payload = utf-8
    * bytes of the text. Production ingestion would read real blobs
    * (binaryFile source) into the same shape. */
  def payloadFromText(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", kind: String = "image"): Dataset[MediaRecord] =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(textCol).cast("binary").as("payload"))
      .as(Encoders.product[MediaRecord])

  /** Partition-batched decode → features. The iterator→iterator shape is the
    * scale contract: constant memory per partition, decoder init amortized
    * once per partition (not per row). */
  def imageFeatures(media: Dataset[MediaRecord],
                    decoder: MediaDecoder = StubDecoder): Dataset[ImageFeatures] =
    media.mapPartitions { it =>
      // per-partition decoder setup would go here (native handles etc.)
      it.map { rec =>
        val (w, h, b) = decoder.decodeImage(rec.payload)
        ImageFeatures(rec.media_id, rec.payload.length.toLong, w, h,
          math.rint(b * 10000) / 10000)
      }
    }(Encoders.product[ImageFeatures])

  /** Stubbed resize: re-derives features at a target box, keeping aspect from
    * the fake decode — exercises a second pass over the binary column. */
  def resizeFeatures(media: Dataset[MediaRecord], maxSide: Int,
                     decoder: MediaDecoder = StubDecoder): Dataset[ImageFeatures] =
    media.mapPartitions { it =>
      it.map { rec =>
        val (w, h, b) = decoder.decodeImage(rec.payload)
        val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
        ImageFeatures(rec.media_id, rec.payload.length.toLong,
          math.max(1, math.floor(w * scale).toInt),
          math.max(1, math.floor(h * scale).toInt),
          math.rint(b * 10000) / 10000)
      }
    }(Encoders.product[ImageFeatures])

  /** Stubbed frame sampling for video payloads: emits `everyN`-spaced frame
    * indices with per-frame fake features (one output row per frame —
    * the Generator/flatMap shape a real frame extractor has). */
  final case class FrameFeature(media_id: Long, frame_idx: Int, brightness: Double)

  def sampleFrames(media: Dataset[MediaRecord], nFrames: Int = 4,
                   decoder: MediaDecoder = StubDecoder): Dataset[FrameFeature] =
    media.flatMap { rec =>
      val (_, _, b) = decoder.decodeImage(rec.payload)
      (0 until nFrames).map(i =>
        FrameFeature(rec.media_id, i, math.rint(((b + i * 0.1) % 1.0) * 10000) / 10000))
    }(Encoders.product[FrameFeature])
}
