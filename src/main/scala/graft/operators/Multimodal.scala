package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media travel as opaque `binary`
  * columns with typed metadata structs; decode / feature-extraction
  * runs as a batched partition-local transform (the Scala analogue of
  * a vectorized `mapInPandas` — the iterator is consumed in fixed
  * batches so a real decoder could amortize model/codec setup per
  * batch instead of per row).
  *
  * The decode itself is a clearly-marked deterministic STUB — image /
  * audio codecs aren't available in this environment. Everything
  * around it (schema, batch shape, partition locality, metadata
  * struct) is real and tested; swap `decodeBatch` for a JNI/codec
  * call and nothing else changes.
  */
object Multimodal {

  val batchSize = 64

  final case class MediaRecord(media_id: Long, payload: Array[Byte])
  final case class MediaMeta(
      media_id: Long, n_bytes: Long, width: Int, height: Int,
      channels: Int, format: String)

  /** STUB decoder: derives metadata deterministically from the byte
    * length (a real implementation would parse the container header /
    * run the codec here — `???` territory, faked for testability). */
  private def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaMeta] =
    batch.map { r =>
      val n = r.payload.length.toLong
      MediaMeta(r.media_id, n, (n % 640).toInt, ((n * 7) % 480).toInt, 3, "fake")
    }

  /** Batched partition-local decode: binary in, typed metadata out.
    * No shuffle — decode cost scales linearly with partitions. */
  def decode(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(decodeBatch))
  }

  /** Text → fake media frame: documents become binary payloads (the
    * corpus has no real images; the binary-column path is identical). */
  def documentsAsMedia(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Batched feature extraction: payload bytes → fixed-dim histogram
    * (byte % 8 bucket counts). The STUB stands where an image/audio
    * feature model would run; the batch shape is the part that
    * matters — a real encoder amortizes weights-loading per batch of
    * `batchSize` records, exactly like a vectorized Python UDF. */
  def extractFeatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
      val h = new Array[Long](8)
      r.payload.foreach(b => h((b & 0xff) % 8) += 1)
      (r.media_id, h(0), h(1), h(2), h(3), h(4), h(5), h(6), h(7))
    })).toDF("media_id", "c0", "c1", "c2", "c3", "c4", "c5", "c6", "c7")
  }

  /** Frame sampling plumbing: explode a payload into every `stride`-th
    * byte-offset "frame" (stand-in for video frame extraction; shows
    * the row-multiplying decode shape + metadata propagation). */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      Iterator.range(0, r.payload.length, stride).map { off =>
        (r.media_id, off, r.payload.length.toLong)
      }
    }.toDF("media_id", "frame_offset", "n_bytes")
  }
}
