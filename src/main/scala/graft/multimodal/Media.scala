package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed in partition-batches.
  *
  * The decode step is a clearly-marked STUB (this container ships no
  * image/audio codecs): `decodeStub` derives deterministic fake features
  * from the bytes. Everything AROUND the stub is the real at-scale
  * plumbing and is tested: schema, per-partition batch processing
  * (`mapPartitions` over a typed Dataset — the Scala analog of a
  * batch-shaped Pandas UDF), and the rule that payload bytes never
  * travel through a shuffle (derive features first, shuffle the small
  * feature rows, never groupBy/join on a DataFrame still carrying blobs).
  */
object Media {

  final case class MediaRow(
      media_id: Long,
      mime: String,
      blob: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      byte_len: Int,
      // stub "decoded" signals — deterministic functions of the bytes
      fake_width: Int,
      fake_height: Int,
      channel_mean: Double)

  /** STUB decoder: a real implementation would parse the codec here (e.g.
    * JPEG markers); the fake derives stable pseudo-features from byte
    * content so the pipeline around it is fully exercisable.
    */
  def decodeStub(blob: Array[Byte]): (Int, Int, Double) = {
    val h = java.util.Arrays.hashCode(blob)
    val w = 16 + math.floorMod(h, 1024)
    val ht = 16 + math.floorMod(h >> 10, 1024)
    val mean =
      if (blob.isEmpty) 0.0
      else blob.iterator.map(b => (b & 0xff).toDouble).sum / blob.length
    (w, ht, math.rint(mean * 10000) / 10000)
  }

  /** Batch feature extraction: one decode pass per partition, payload
    * dropped on output (features only cross the shuffle boundary).
    */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val (w, h, mean) = decodeStub(r.blob)
        MediaFeatures(r.media_id, r.mime, r.blob.length, w, h, mean)
      }
    }
  }

  /** "Resize": in a real build this re-encodes pixels; the stub rescales
    * the fake dimensions, keeping the batch shape + signature honest.
    */
  def resize(ds: Dataset[MediaFeatures], maxDim: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.map { f =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(f.fake_width, f.fake_height))
      f.copy(
        fake_width = math.max(1, (f.fake_width * scale).toInt),
        fake_height = math.max(1, (f.fake_height * scale).toInt))
    }
  }

  /** Frame sampling for "video" payloads: deterministic frame offsets from
    * the byte length — every k-th of n virtual frames.
    */
  def sampleFrameOffsets(ds: Dataset[MediaRow], everyK: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val nFrames = math.max(1, r.blob.length / 64)
      (0 until nFrames by everyK).map(i => (r.media_id, i, i * 64))
    }.toDF("media_id", "frame_idx", "byte_offset")
  }
}
