package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batch-shaped partition
  * passes (`mapPartitions` over a typed Dataset — the Scala analog of
  * Python's `mapInPandas` batches).
  *
  * The actual codec work is STUBBED (this container ships no image/audio
  * libraries): `decodeStub` derives deterministic fake dimensions from
  * the payload's md5, with the real seam marked — swap `decodeStub`'s
  * body for a JNI/ImageIO call and every schema, partition and join
  * downstream is unchanged. The Spark-side plumbing (binary columns,
  * schema, partition-batched processing, frame explosion) is real and
  * oracle-checked via `m_*` queries.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class DecodedMeta(media_id: Long, kind: String, n_bytes: Int,
      checksum: String, width: Int, height: Int, n_frames: Int)
  final case class Frame(media_id: Long, frame_idx: Int, offset_pct: Double)
  final case class Resized(media_id: Long, kind: String,
      src_width: Int, src_height: Int, out_width: Int, out_height: Int,
      scale: Double)

  /** Attach a binary payload column (here: utf8 text bytes; in a real
    * pipeline: the raw image/audio bytes from the lake).
    */
  def withPayload(df: DataFrame, sourceCol: String): DataFrame =
    df.withColumn("payload", col(sourceCol).cast("binary"))

  private def hexNibble(c: Char): Int = "0123456789abcdef".indexOf(c)
  private def hexByte(h: String, i: Int): Int =
    hexNibble(h.charAt(i)) * 16 + hexNibble(h.charAt(i + 1))

  /** STUB decode — deterministic fake dimensions from the md5 hex of the
    * payload, so results are engine-reproducible:
    *   width    = 256 + byte0 * 8
    *   height   = 144 + byte1 * 4
    *   n_frames = 1 + nibble4
    * Real implementation point: replace the body of `decode` with the
    * actual codec (??? semantics); everything around it stays.
    */
  def decodeStub(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one digest per partition — the "load the model/codec once per
      // batch" pattern that matters when the real library is expensive
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val hex = md.digest(r.payload).map("%02x".format(_)).mkString
        DecodedMeta(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = r.payload.length,
          checksum = hex,
          width = 256 + hexByte(hex, 0) * 8,
          height = 144 + hexByte(hex, 2) * 4,
          n_frames = 1 + hexNibble(hex.charAt(4)))
      }
    }
  }

  /** Even-spaced frame sampling: one row per sampled frame (what you'd
    * feed to a vision encoder). Pure column math — no decode needed for
    * offset planning.
    */
  def sampleFrames(meta: Dataset[DecodedMeta], maxFrames: Int): Dataset[Frame] = {
    import meta.sparkSession.implicits._
    meta.flatMap { m =>
      val n = math.min(m.n_frames, maxFrames)
      (0 until n).map { i =>
        Frame(m.media_id, i, if (n == 1) 0.0 else i.toDouble / (n - 1))
      }
    }
  }

  /** Aspect-fit resize PLANNING: the largest scale ≤ 1 that fits the
    * decoded dimensions inside `maxW × maxH` (never upscales), with
    * even output dims (codec-friendly). The geometry is exact column
    * math here; the pixel resampling itself is the same stub seam as
    * `decodeStub` — the real implementation replaces the payload
    * transform, the planned dimensions stay authoritative.
    */
  def resizePlan(meta: Dataset[DecodedMeta], maxW: Int, maxH: Int): Dataset[Resized] = {
    import meta.sparkSession.implicits._
    meta.map { m =>
      val scale = math.min(1.0,
        math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
      def even(x: Int) = math.max(2, x - x % 2)
      Resized(m.media_id, m.kind, m.width, m.height,
        even(math.floor(m.width * scale).toInt),
        even(math.floor(m.height * scale).toInt),
        scale)
    }
  }

  /** Deterministic fake feature vector (hash-seeded), the embedding-stub
    * twin of `decodeStub`.
    */
  def featureStub(payload: Column, dim: Int): Column = {
    val h = md5(payload)
    array((0 until dim).map { i =>
      (conv(substring(h, (i % 8) * 4 + 1, 4), 16, 10).cast("long") % 1000)
        .cast("double") / 1000.0
    }: _*)
  }
}
