package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batch-shaped partition
  * passes (`mapPartitions` over a typed Dataset — the Scala analog of
  * Python's `mapInPandas` batches).
  *
  * [[decode]] does REAL container parsing: PNG signature+IHDR
  * (width/height big-endian, CRC'd chunk) and canonical RIFF/WAVE PCM
  * headers (rate/channels/sample-frames little-endian) are read off
  * the bytes. Payloads with neither magic fall to the md5 STUB branch
  * — the honest seam for codecs this environment doesn't ship (full
  * image decompression, video demux): swap that branch for a
  * JNI/ImageIO call and every schema, partition and join downstream
  * is unchanged. The Spark-side plumbing (binary columns, schema,
  * partition-batched processing, frame explosion) is real and
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

  /** WAV sample rates the synthetic generator cycles through. */
  val WavRates: IndexedSeq[Int] = IndexedSeq(8000, 16000, 22050, 44100, 48000)

  /** PNG container prefix: 8-byte signature + a genuine IHDR chunk
    * (length, type, 13 data bytes, real CRC32 over type+data) — 33
    * bytes a real PNG parser accepts as the file head.
    */
  def pngPrefix(width: Int, height: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33)
    bb.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    bb.putInt(13)                       // IHDR data length
    val typeAndData = java.nio.ByteBuffer.allocate(17)
    typeAndData.put("IHDR".getBytes("US-ASCII"))
    typeAndData.putInt(width).putInt(height)
    typeAndData.put(8.toByte)           // bit depth
    typeAndData.put(6.toByte)           // color type RGBA
    typeAndData.put(0.toByte).put(0.toByte).put(0.toByte) // compr/filter/interlace
    val td = typeAndData.array()
    bb.put(td)
    val crc = new java.util.zip.CRC32()
    crc.update(td)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Canonical 44-byte RIFF/WAVE PCM header (16-bit samples). */
  def wavHeader(sampleRate: Int, channels: Int, dataLen: Int): Array[Byte] = {
    val blockAlign = channels * 2
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1.toShort)              // PCM
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * blockAlign)  // byte rate
    bb.putShort(blockAlign.toShort)
    bb.putShort(16.toShort)             // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  /** Deterministic synthetic CONTAINER payloads: image rows get a
    * genuine PNG signature+IHDR prefix (real CRC32), audio rows a
    * canonical RIFF/WAVE PCM header; video rows stay raw bytes so the
    * unknown-magic stub path keeps a live consumer. The geometry/rate
    * fields derive from media_id by fixed modular rules (so a SQL
    * oracle can recompute them) — but [[decode]] READS THE BYTES, not
    * the rule: flipping a header byte changes its answer.
    */
  def containerize(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      r.kind match {
        case "image" =>
          val w = 64 + (r.media_id % 241).toInt * 8
          val h = 64 + (r.media_id % 137).toInt * 8
          r.copy(payload = pngPrefix(w, h) ++ r.payload)
        case "audio" =>
          val rate = WavRates((r.media_id % 5).toInt)
          val ch = 1 + (r.media_id % 2).toInt
          r.copy(payload = wavHeader(rate, ch, r.payload.length) ++ r.payload)
        case _ => r
      }
    }
  }

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def ascii(b: Array[Byte], off: Int, s: String): Boolean =
    s.indices.forall(i => b(off + i) == s.charAt(i).toByte)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Container-aware decode: REAL byte parsing at the codec seam.
    *
    *   - PNG magic → width/height read big-endian out of the IHDR
    *     chunk; n_frames = 1; content = bytes after the 33-byte prefix.
    *   - RIFF/WAVE magic → the DecodedMeta mapping for audio is
    *     width = sample rate (Hz), height = channels, and n_frames =
    *     data bytes / block align — WAV's own term for that count IS
    *     "sample frames" (one sample per channel).
    *   - anything else → the md5 stub rule below (the honest seam for
    *     codecs this container doesn't ship; video stays here).
    *
    * `checksum` is always the md5 of the CONTENT bytes (payload minus
    * container prefix), so content-addressed dedup sees through
    * container metadata.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one digest per partition — the "load the model/codec once per
      // batch" pattern that matters when the real library is expensive
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(bytes: Array[Byte], from: Int): String = {
        md.reset()
        md.update(bytes, from, bytes.length - from)
        md.digest().map("%02x".format(_)).mkString
      }
      rows.map { r =>
        val p = r.payload
        if (p.length >= 33 && p.take(8).sameElements(PngSig) &&
            ascii(p, 12, "IHDR")) {
          DecodedMeta(r.media_id, r.kind, p.length, hex(p, 33),
            width = beInt(p, 16), height = beInt(p, 20), n_frames = 1)
        } else if (p.length >= 44 && ascii(p, 0, "RIFF") &&
            ascii(p, 8, "WAVE") && ascii(p, 12, "fmt ") &&
            ascii(p, 36, "data")) {
          val channels = leShort(p, 22)
          val rate = leInt(p, 24)
          val blockAlign = leShort(p, 32)
          // clamp the header's declared data length to the bytes that
          // actually follow: a truncated/malformed header must not
          // inflate n_frames past the payload (r8-advice)
          val dataLen = math.max(0, math.min(leInt(p, 40), p.length - 44))
          DecodedMeta(r.media_id, r.kind, p.length, hex(p, 44),
            width = rate, height = channels,
            n_frames = if (blockAlign > 0) dataLen / blockAlign else 0)
        } else {
          // STUB path — deterministic fake dimensions from the md5 of
          // the payload. Real implementation point for codecs beyond
          // PNG/WAV headers: replace this branch; everything around it
          // (schema, partitioning, downstream joins) stays.
          val h = hex(p, 0)
          DecodedMeta(r.media_id, r.kind, p.length, h,
            width = 256 + hexByte(h, 0) * 8,
            height = 144 + hexByte(h, 2) * 4,
            n_frames = 1 + hexNibble(h.charAt(4)))
        }
      }
    }
  }

  /** Headerless-era alias: on payloads without container magic,
    * [[decode]] IS the stub path. Kept for call sites that feed raw
    * (un-containerized) media.
    */
  def decodeStub(media: Dataset[MediaRow]): Dataset[DecodedMeta] =
    decode(media)

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
