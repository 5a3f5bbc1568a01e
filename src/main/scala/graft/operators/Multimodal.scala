package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` payload column next to
  * typed metadata, and decode/feature-extraction runs as a typed
  * `mapPartitions` over the payload bytes — the Spark-side shape
  * (schema, encoders, partitioning, per-partition batching) is real and
  * tested. The IMAGE codec is real (JDK `javax.imageio`, zero extra
  * dependencies — PNG/JPEG/GIF/BMP decode with true width/height), and
  * so is the AUDIO codec (JDK `javax.sound.sampled` — WAV/AIFF/AU
  * decode with true sample rate, channels, frame count, duration).
  * VIDEO container metadata is real too — a pure-JDK ISO-BMFF (MP4/MOV)
  * box parse ([[parseMp4]]) reads true duration/timescale, display
  * dimensions and codec fourcc; only frame/pixel DECODE remains behind
  * the deterministic hash-derived stub seam (video codec libs are not
  * in this environment, and container metadata doesn't need them).
  *
  * At scale the rules this module encodes:
  *  - payloads stay OUT of shuffle keys and aggregations — all keyed
  *    work happens on `doc_id`/metadata, payloads are only ever mapped;
  *  - decode is per-partition (`mapPartitions`), so a real codec would
  *    amortize native-library init once per partition, not per record;
  *  - frame sampling multiplies rows, so it runs AFTER filtering and
  *    projects the payload away, emitting only per-frame fingerprints/
  *    features.
  */
object Multimodal {

  /** A media record: opaque payload + the metadata a real pipeline
    * carries alongside (media_type discriminates the decode path). */
  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded per-item features. Image payloads get REAL width/height
    * from ImageIO; audio/video (and unreadable payloads) get the
    * deterministic hash-derived stand-ins so tests and the DuckDB
    * oracle can reproduce them bit-for-bit. */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, byte_len: Long, fp: String,
      width: Long, height: Long, n_frames: Long)

  final case class FrameSample(doc_id: Long, frame_idx: Long, frame_fp: String)

  /** Typed audio features — the honest column names for the audio
    * modality (the generic [[MediaFeatures]] shape has no natural home
    * for sample rate / duration). `decoded = false` marks the
    * hash-derived stand-in used when the payload isn't a readable
    * WAV/AIFF/AU stream. */
  final case class AudioFeatures(
      doc_id: Long, byte_len: Long, fp: String,
      sample_rate: Long, channels: Long, n_samples: Long,
      duration_ms: Long, decoded: Boolean)

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Magic-byte sniff for the container formats the JDK's built-in
    * ImageIO readers handle (PNG / JPEG / GIF / BMP). Content sniffing,
    * not trial decode: non-image payloads (the synthetic text stand-ins,
    * audio, video) skip the codec entirely instead of paying an
    * exception per record. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** REAL image decode via the JDK's `javax.imageio` (zero extra
    * dependencies): full pixel decode, real width/height, single frame.
    * Returns None when ImageIO has no reader for the bytes (corrupt
    * payload, or a format the JDK lacks) — the caller falls back to the
    * deterministic stub so a bad record degrades instead of killing the
    * task. */
  private def decodeImage(r: MediaRecord): Option[MediaFeatures] = {
    // NonFatal, not just IOException: a payload whose first bytes sniff
    // as an image but whose body is garbage can drive a reader into any
    // runtime error — degrade to the stub, never kill the task
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { i =>
      MediaFeatures(
        doc_id = r.doc_id,
        media_type = r.media_type,
        byte_len = r.payload.length.toLong,
        fp = md5hex(r.payload),
        width = i.getWidth.toLong,
        height = i.getHeight.toLong,
        n_frames = 1L)
    }
  }

  /** Magic-byte sniff for the container formats the JDK's built-in
    * audio readers handle: WAV (`RIFF….WAVE`), AIFF/AIFC (`FORM….AIF…`),
    * and AU (`.snd`). Same rationale as [[looksLikeImage]]: non-audio
    * payloads skip the codec instead of paying an exception each. */
  private def looksLikeAudio(b: Array[Byte]): Boolean =
    b.length >= 12 && (
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
        b(8) == 'A' && b(9) == 'I' && b(10) == 'F') ||
      (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'))

  /** REAL audio decode via the JDK's `javax.sound.sampled` (zero extra
    * dependencies): parses the WAV/AIFF/AU container, returning the true
    * sample rate, channel count, frame count and derived duration.
    * None when the stream is unreadable or reports no frame length —
    * the caller degrades to the deterministic stub, never kills the
    * task. */
  private def decodeAudio(r: MediaRecord): Option[AudioFeatures] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        if (frames < 0 || fmt.getSampleRate <= 0 || fmt.getChannels <= 0) None
        else Some(AudioFeatures(
          doc_id = r.doc_id,
          byte_len = r.payload.length.toLong,
          fp = md5hex(r.payload),
          sample_rate = fmt.getSampleRate.toLong,
          channels = fmt.getChannels.toLong,
          n_samples = frames,
          duration_ms = math.round(frames * 1000.0 / fmt.getSampleRate),
          decoded = true))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** STUB decode for payloads none of the real paths can read: images/
    * audio the JDK readers cannot parse, and video payloads that are
    * not ISO-BMFF (the container-metadata parse IS real — [[parseMp4]];
    * only frame/pixel decode lacks a codec here). The stand-in derives
    * every "decoded" attribute from md5(payload), so it is
    * deterministic, engine-independent, and exercises the exact same
    * plumbing (bytes in → typed features out). */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val fp = md5hex(r.payload)
    val h = java.lang.Long.parseLong(fp.take(15), 16)
    MediaFeatures(
      doc_id = r.doc_id,
      media_type = r.media_type,
      byte_len = r.payload.length.toLong,
      fp = fp,
      width = 320 + h % 1600,
      height = 240 + (h / 7) % 840,
      n_frames = if (r.media_type == "video") 1 + h % 16 else 1L)
  }

  /** Decode/feature-extract each payload. Partition-wise so codec init
    * amortizes once per partition. The image path is a REAL decode
    * (JDK ImageIO — PNG/JPEG/GIF/BMP), and a readable audio payload
    * decodes for REAL too, surfaced through the generic shape as
    * `width := sample_rate (Hz)`, `height := channels`, `n_frames := 1`
    * (documented overload — the generic columns have no audio meaning;
    * [[extractAudioFeatures]] is the honestly-named typed path). Video
    * remains behind the deterministic stub seam until a codec exists
    * in the image. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init: ImageIO scans its reader SPI registry
      // lazily on first use; disk caching off keeps decode in-memory
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        if (r.media_type == "image" && looksLikeImage(r.payload))
          decodeImage(r).getOrElse(decodeStub(r))
        else if (r.media_type == "audio" && looksLikeAudio(r.payload))
          decodeAudio(r).map(a => MediaFeatures(
            doc_id = r.doc_id, media_type = r.media_type,
            byte_len = a.byte_len, fp = a.fp,
            width = a.sample_rate, height = a.channels, n_frames = 1L))
            .getOrElse(decodeStub(r))
        else if (r.media_type == "video" && looksLikeVideo(r.payload))
          // real container parse: true display dims; n_frames is the
          // stsz sample count when present, else the 1-fps sampling
          // policy over the TRUE duration (frame decode itself stays
          // stubbed — see extractVideoFeatures for the honestly-named
          // typed path)
          parseMp4(r.payload).map(m => MediaFeatures(
            doc_id = r.doc_id, media_type = r.media_type,
            byte_len = r.payload.length.toLong, fp = md5hex(r.payload),
            width = m.width, height = m.height,
            n_frames =
              if (m.nFrames > 0) m.nFrames
              else math.max(1L,
                if (m.timescale > 0) m.duration / m.timescale else 1L)))
            .getOrElse(decodeStub(r))
        else decodeStub(r)
      }
    }
  }

  /** Typed AUDIO feature extraction — real decode (WAV/AIFF/AU via the
    * JDK) with the hash-derived stand-in for unreadable payloads, under
    * honest column names. Same scale posture as [[extractFeatures]]:
    * pure per-partition map, payload never shuffles. */
  def extractAudioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        (if (looksLikeAudio(r.payload)) decodeAudio(r) else None).getOrElse {
          val fp = md5hex(r.payload)
          val h = java.lang.Long.parseLong(fp.take(15), 16)
          // stub duration is exact INTEGER division (not a float round)
          // so the DuckDB oracle reproduces it bit-for-bit
          AudioFeatures(
            doc_id = r.doc_id, byte_len = r.payload.length.toLong, fp = fp,
            sample_rate = 8000 + (h % 5) * 8000, channels = 1 + h % 2,
            n_samples = 1000 + h % 100000,
            duration_ms = (1000 + h % 100000) * 1000L / (8000 + (h % 5) * 8000),
            decoded = false)
        }
      }
    }
  }

  /** Typed video CONTAINER metadata — the honest column names for the
    * video modality. `decoded = true` means the fields came from a real
    * ISO-BMFF (MP4/MOV) box parse ([[parseMp4]]); false marks the
    * hash-derived stand-in for payloads that are not a readable MP4.
    * Frame/pixel decode stays stubbed elsewhere (no codec libs in this
    * environment) — container metadata needs none: duration, timescale,
    * display dimensions and the codec fourcc are plain big-endian
    * integers in the moov box, readable with zero dependencies. */
  final case class VideoFeatures(
      doc_id: Long, byte_len: Long, fp: String,
      duration_ms: Long, timescale: Long, width: Long, height: Long,
      codec: String, n_frames: Long, n_tracks: Long, decoded: Boolean)

  /** Magic-byte sniff for ISO-BMFF containers (MP4/MOV/3GP…): every
    * conforming file leads with an `ftyp` box, i.e. bytes 4-7 spell
    * "ftyp". Same rationale as [[looksLikeImage]]: non-video payloads
    * skip the parser instead of paying a failed walk each. Unlike the
    * PNG/JPEG magic, "ftyp" is pure ASCII and can occur in plain text,
    * so bytes 0-3 must ALSO decode as a plausible ftyp box size
    * (8 ≤ size ≤ payload length, and ≥ 16 in practice since the box
    * carries major_brand + minor_version) — no natural-language prefix
    * is a big-endian u32 in that range, so a text payload can no
    * longer wander into [[parseMp4]] and risk a flaky decoded=true. */
  private def looksLikeVideo(b: Array[Byte]): Boolean =
    b.length >= 16 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p' && {
      val size = ((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) |
        ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL)
      size >= 16L && size <= b.length.toLong
    }

  /** What a successful [[parseMp4]] found. width/height/codec describe
    * the FIRST track whose tkhd carries nonzero display dimensions (the
    * video track — audio tracks are 0×0 by spec); an audio-only MP4
    * legitimately reports 0×0 and the first track's codec. */
  private final case class Mp4Meta(
      timescale: Long, duration: Long, width: Long, height: Long,
      codec: String, nFrames: Long, nTracks: Long)

  /** Per-trak accumulator for the box walk (tkhd dims, stsd fourcc,
    * stsz sample count of the trak currently being descended). */
  private final class TrakAcc {
    var w = 0L; var h = 0L; var codec = ""; var nSamples = 0L
  }

  /** Minimal pure-JDK ISO-BMFF box walk (ISO/IEC 14496-12 §4.2, §8.2.2,
    * §8.3.2, §8.5.2): top-level boxes are [size:u32][type:4cc] with
    * size==1 → 64-bit largesize follows, size==0 → box runs to EOF.
    * Containers descended: moov, trak, mdia, minf, stbl. Leaves read:
    * mvhd (movie timescale + duration, version 0 and 1 layouts), tkhd
    * (16.16 fixed-point display width/height, both versions), stsd
    * (first sample-entry fourcc = the codec), stsz (sample count =
    * the track's true frame count). Malformed input (sizes
    * running past the buffer, truncated headers, absurd nesting) stops
    * the walk instead of throwing — the caller degrades to the stub.
    * None unless a plausible mvhd was found (timescale > 0). */
  private def parseMp4(bytes: Array[Byte]): Option[Mp4Meta] = {
    def u32(off: Int): Long =
      ((bytes(off) & 0xFFL) << 24) | ((bytes(off + 1) & 0xFFL) << 16) |
        ((bytes(off + 2) & 0xFFL) << 8) | (bytes(off + 3) & 0xFFL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def fourcc(off: Int): String = new String(bytes, off, 4, "ISO-8859-1")
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    var timescale = 0L; var duration = -1L
    var width = 0L; var height = 0L; var codec = ""; var nTracks = 0L
    var nFrames = 0L
    var firstCodec = ""

    def walk(start: Long, end: Long, depth: Int, trak: TrakAcc): Unit = {
      var off = start
      var ok = true
      while (ok && off + 8 <= end && depth < 8) {
        var size = u32(off.toInt)
        val typ = fourcc(off.toInt + 4)
        var hdr = 8L
        if (size == 1L && off + 16 <= end) { size = u64(off.toInt + 8); hdr = 16L }
        else if (size == 0L) size = end - off
        if (size < hdr || size > end - off) ok = false // malformed: stop
        else {
          val body = off + hdr
          val bodyEnd = off + size
          typ match {
            case "trak" =>
              nTracks += 1
              val acc = new TrakAcc
              walk(body, bodyEnd, depth + 1, acc)
              if (firstCodec.isEmpty && acc.codec.nonEmpty) firstCodec = acc.codec
              // first track with real display dims = the video track
              if (width == 0L && acc.w > 0L) {
                width = acc.w; height = acc.h; codec = acc.codec
                nFrames = acc.nSamples
              }
            case t if containers(t) => walk(body, bodyEnd, depth + 1, trak)
            case "mvhd" if body + 4 <= bodyEnd =>
              val ver = bytes(body.toInt) & 0xFF
              if (ver == 1 && body + 32 <= bodyEnd) {
                timescale = u32(body.toInt + 20); duration = u64(body.toInt + 24)
              } else if (ver == 0 && body + 20 <= bodyEnd) {
                timescale = u32(body.toInt + 12); duration = u32(body.toInt + 16)
              }
              // ISO 14496-12 "duration unknown" sentinel: all-ones.
              // v1's u64 all-ones already reads as -1 (rejected below);
              // v0's 0xFFFFFFFF would otherwise pass as a real ~4.3e9-
              // tick duration (common in fragmented MP4s whose true
              // duration lives in mehd) — map it to the same reject
              if (duration == 0xFFFFFFFFL) duration = -1L
            case "tkhd" if trak != null && body + 4 <= bodyEnd =>
              val ver = bytes(body.toInt) & 0xFF
              // offsets to the 16.16 fixed-point display size: v0 body
              // is 84 bytes (width at +76), v1 is 96 (width at +88)
              val wOff = if (ver == 1) 88 else 76
              if (body + wOff + 8 <= bodyEnd) {
                trak.w = u32(body.toInt + wOff) >> 16
                trak.h = u32(body.toInt + wOff + 4) >> 16
              }
            case "stsd" if trak != null && trak.codec.isEmpty && body + 16 <= bodyEnd =>
              // FullBox(4) + entry_count(4) + first entry [size:u32][fourcc]
              trak.codec = fourcc(body.toInt + 12).trim
            case "stsz" if trak != null && body + 12 <= bodyEnd =>
              // FullBox(4) + sample_size(4) + sample_count(4): the
              // track's true frame/sample count, no decode needed
              trak.nSamples = u32(body.toInt + 8)
            case _ => ()
          }
          off = bodyEnd
        }
      }
    }

    try {
      walk(0L, bytes.length.toLong, 0, null)
      // duration bound: the caller computes duration*1000/timescale in
      // Long — a hostile/corrupt v1 mvhd advertising > Long.MaxValue/1000
      // ticks (~9.2e15; 292 Myr even at a 1 GHz timescale) would wrap
      // that multiply into a NEGATIVE duration_ms with decoded=true.
      // No real container is there, so reject to the stub, loudly
      // consistent with the repo's no-silent-overflow discipline.
      if (timescale <= 0L || duration < 0L ||
        duration > Long.MaxValue / 1000L) None
      else Some(Mp4Meta(timescale, duration, width, height,
        if (codec.nonEmpty) codec else firstCodec, nFrames, nTracks))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic stand-in video features for non-MP4 payloads — the
    * same md5-derived convention as the audio stub, integer-exact so
    * the DuckDB oracle reproduces every field bit-for-bit. */
  private def videoStub(r: MediaRecord): VideoFeatures = {
    val fp = md5hex(r.payload)
    val h = java.lang.Long.parseLong(fp.take(15), 16)
    VideoFeatures(
      doc_id = r.doc_id, byte_len = r.payload.length.toLong, fp = fp,
      duration_ms = 1000 + h % 600000,
      timescale = 600L * (1 + h % 4),
      width = 320 + h % 1600, height = 240 + (h / 7) % 840,
      codec = Seq("avc1", "hev1", "vp09", "av01")((h % 4).toInt),
      // 24 fps over the stub duration, integer floor — engine-portable
      n_frames = 24L * (1000 + h % 600000) / 1000,
      n_tracks = 1 + h % 2,
      decoded = false)
  }

  /** Typed VIDEO container-metadata extraction — REAL for ISO-BMFF
    * payloads (pure-JDK box parse: true duration/timescale, display
    * dimensions, codec fourcc, track count), hash-derived stand-in for
    * everything else. duration_ms is integer floor division
    * (duration·1000 div timescale) so the value is engine-portable.
    * Same scale posture as the other decode passes: pure per-partition
    * map, the payload never enters a shuffle. Frame/pixel decode
    * remains behind the documented stub seam ([[decodeStub]]) — THIS
    * pass needs no codec, which is exactly why it can be real here. */
  def extractVideoFeatures(media: Dataset[MediaRecord]): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        (if (looksLikeVideo(r.payload)) parseMp4(r.payload) else None) match {
          case Some(m) =>
            VideoFeatures(
              doc_id = r.doc_id, byte_len = r.payload.length.toLong,
              fp = md5hex(r.payload),
              duration_ms =
                if (m.timescale > 0) m.duration * 1000L / m.timescale else 0L,
              timescale = m.timescale, width = m.width, height = m.height,
              codec = m.codec,
              // stsz sample count when the container carries it; else
              // the 1-fps duration policy (still real duration)
              n_frames =
                if (m.nFrames > 0) m.nFrames
                else math.max(1L,
                  if (m.timescale > 0) m.duration / m.timescale else 1L),
              n_tracks = m.nTracks, decoded = true)
          case None => videoStub(r)
        }
      }
    }
  }

  /** REAL image resize (JDK Graphics2D bilinear draw into a bounded
    * canvas, re-encoded as PNG): payloads whose media_type is "image"
    * and whose bytes decode are downscaled to fit `maxW`×`maxH`
    * preserving aspect ratio (never upscaled); everything else — audio,
    * video, unreadable images — passes through untouched, so the
    * operator is safe to run across a mixed corpus. Per-partition
    * mapPartitions like the decode pass: a real pipeline amortizes
    * codec init once per partition, and the payload column never enters
    * a shuffle (resize is a pure map). Deterministic: same bytes in →
    * same bytes out (JDK PNG encoding carries no timestamps), so
    * downstream content-hash dedup of resized corpora is stable. */
  def resizeImages(media: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[MediaRecord] = {
    require(maxW > 0 && maxH > 0, s"resize bounds must be positive: ${maxW}x$maxH")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        if (r.media_type != "image" || !looksLikeImage(r.payload)) r
        else {
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null || (img.getWidth <= maxW && img.getHeight <= maxH)) r
          else {
            val scale = math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight)
            val w = math.max(1, math.round(img.getWidth * scale).toInt)
            val h = math.max(1, math.round(img.getHeight * scale).toInt)
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
            } finally g.dispose()
            val bytes = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bytes)
            MediaRecord(r.doc_id, r.media_type, bytes.toByteArray)
          }
        }
      }
    }
  }

  /** Sample `n_frames` per item, emitting a fingerprint per frame (a
    * real pipeline would emit per-frame tensors/embeddings). Row count
    * multiplies here, so inputs should already be filtered and the
    * payload is not carried through. */
  def sampleFrames(feats: Dataset[MediaFeatures]): Dataset[FrameSample] = {
    import feats.sparkSession.implicits._
    feats.flatMap { f =>
      (0L until f.n_frames).iterator.map { i =>
        FrameSample(f.doc_id, i, md5hex(s"${f.fp}:$i".getBytes("UTF-8")))
      }
    }
  }

  /** Build a synthetic media table from `documents`: payload = UTF-8
    * bytes of the text (a stand-in for real image/audio bytes), typed
    * media_type from doc_id. This is the ingest boundary a real
    * pipeline would replace with `spark.read.format("binaryFile")`. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** SparkSession-level entry used by the query registry. */
  def features(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(mediaFromDocuments(docs)).toDF()

  def frames(spark: SparkSession, docs: DataFrame): DataFrame =
    sampleFrames(extractFeatures(mediaFromDocuments(docs))).toDF()
}
