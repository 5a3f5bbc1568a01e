package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  private lazy val docs = spark.read.parquet(sf("documents"))

  test("media table: binary payload + typed metadata schema") {
    val media = Multimodal.mediaFromDocuments(docs)
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("media_type").dataType.typeName == "string")
    assert(media.count() == docs.count())
    // media_type is a total function of doc_id
    val types = media.toDF().select("media_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("decode stub is deterministic and payload-derived") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
    val twice = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
    assert(feats.toDF().except(twice.toDF()).isEmpty)
    val row = feats.filter(_.doc_id == 0L).head()
    // byte_len equals UTF-8 length of the source text
    val text = docs.filter(col("doc_id") === 0).head().getAs[String]("text")
    assert(row.byte_len == text.getBytes("UTF-8").length.toLong)
    assert(row.width >= 320 && row.width < 1920)
    assert(row.height >= 240 && row.height < 1080)
    assert(row.fp.length == 32)
  }

  test("real image payloads decode through ImageIO with true dimensions") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      // non-trivial pixels so the decode isn't of an all-zero buffer
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 17) & 0xFFFFFF)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val p1 = png(17, 23)
    val p2 = png(640, 1)
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", p1),
      Multimodal.MediaRecord(2L, "image", p2),
      // an "image" record whose bytes are NOT an image → deterministic
      // stub fallback, no task failure
      Multimodal.MediaRecord(3L, "image", "not an image".getBytes("UTF-8")),
      // audio stays on the stub seam even if bytes sniff as PNG
      Multimodal.MediaRecord(4L, "audio", p1)).toDS()
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).width == 17L && feats(1L).height == 23L && feats(1L).n_frames == 1L)
    assert(feats(2L).width == 640L && feats(2L).height == 1L)
    // fp is still md5(payload) on the real-decode path (dedup contract)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(p1)
      .map("%02x".format(_)).mkString
    assert(feats(1L).fp == md5)
    assert(feats(1L).byte_len == p1.length.toLong)
    // fallback record got stub (hash-derived) dimensions, not a crash
    assert(feats(3L).width >= 320L && feats(3L).width < 1920L)
    // audio record ignored its PNG-sniffing bytes: stub path
    assert(feats(4L).media_type == "audio")
    assert(!(feats(4L).width == 17L && feats(4L).height == 23L))
  }

  test("resize: real downscale within bounds, aspect preserved, passthrough elsewhere") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 13 + y * 7) & 0xFFFFFF)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", png(800, 600)), // downscale 2x
      Multimodal.MediaRecord(2L, "image", png(100, 50)),  // already fits — untouched
      Multimodal.MediaRecord(3L, "audio", png(800, 600)), // wrong modality — untouched
      Multimodal.MediaRecord(4L, "image", "garbage".getBytes("UTF-8"))).toDS()
    val once = Multimodal.resizeImages(media, 400, 400).collect().map(r => r.doc_id -> r).toMap
    val dims = Multimodal.extractFeatures(
      Multimodal.resizeImages(media, 400, 400)).collect().map(f => f.doc_id -> f).toMap
    // 800x600 → scale 0.5 → 400x300 (aspect preserved, inside bounds)
    assert(dims(1L).width == 400L && dims(1L).height == 300L, dims(1L))
    // fits / wrong-modality / unreadable: byte-identical passthrough
    Seq(2L, 3L, 4L).foreach { id =>
      assert(once(id).payload.sameElements(
        media.collect().find(_.doc_id == id).get.payload), s"doc $id mutated")
    }
    // deterministic re-encode: same bytes in → same bytes out
    val twice = Multimodal.resizeImages(media, 400, 400).collect()
      .find(_.doc_id == 1L).get.payload
    assert(once(1L).payload.sameElements(twice))
  }

  private def wav(sampleRate: Float, channels: Int, nFrames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
    // deterministic ramp so the payload hash (dedup contract) is stable
    var i = 0
    while (i < pcm.length) { pcm(i) = (i % 251).toByte; i += 1 }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real audio payloads decode through javax.sound.sampled with true properties") {
    import spark.implicits._
    val mono8k = wav(8000f, 1, 4000)     // 500 ms mono
    val stereo44k = wav(44100f, 2, 44100) // 1 s stereo
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", mono8k),
      Multimodal.MediaRecord(2L, "audio", stereo44k),
      // unreadable "audio" → deterministic stub, decoded=false, no crash
      Multimodal.MediaRecord(3L, "audio", "not audio".getBytes("UTF-8"))).toDS()
    val a = Multimodal.extractAudioFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(a(1L).decoded && a(1L).sample_rate == 8000L && a(1L).channels == 1L &&
      a(1L).n_samples == 4000L && a(1L).duration_ms == 500L, a(1L).toString)
    assert(a(2L).decoded && a(2L).sample_rate == 44100L && a(2L).channels == 2L &&
      a(2L).n_samples == 44100L && a(2L).duration_ms == 1000L, a(2L).toString)
    assert(!a(3L).decoded)
    // fp stays md5(payload) on the real path (same dedup contract as images)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(mono8k)
      .map("%02x".format(_)).mkString
    assert(a(1L).fp == md5 && a(1L).byte_len == mono8k.length.toLong)
    // determinism across runs
    assert(Multimodal.extractAudioFeatures(media).toDF()
      .except(Multimodal.extractAudioFeatures(media).toDF()).isEmpty)
    // the generic features pass surfaces the real decode too
    // (documented overload: width := sample_rate, height := channels)
    val g = Multimodal.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(g(1L).width == 8000L && g(1L).height == 1L && g(1L).n_frames == 1L)
    assert(g(2L).width == 44100L && g(2L).height == 2L)
    // an IMAGE record carrying WAV bytes stays off the audio codec
    val cross = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRecord(9L, "image", mono8k)).toDS()).head()
    assert(!(cross.width == 8000L && cross.height == 1L))
  }

  // ---- synthetic ISO-BMFF builders (ISO/IEC 14496-12 layouts) ----
  private def box(typ: String, body: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + body.length)
    out.putInt(8 + body.length).put(typ.getBytes("ISO-8859-1")).put(body)
    out.array()
  }
  /** Same box with the 64-bit largesize encoding (size field == 1). */
  private def box64(typ: String, body: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(16 + body.length)
    out.putInt(1).put(typ.getBytes("ISO-8859-1"))
      .putLong(16L + body.length).put(body)
    out.array()
  }
  private def fullBox(typ: String, version: Int, body: Array[Byte]): Array[Byte] =
    box(typ, Array[Byte](version.toByte, 0, 0, 0) ++ body)
  private def mvhd(timescale: Long, duration: Long, version: Int): Array[Byte] = {
    // v0: creation(4) mod(4) timescale(4) duration(4) + rate/volume/
    // reserved/matrix/predefined/next_track_id = 96-byte payload;
    // v1 widens the three times to 64-bit (108 bytes)
    val b = java.nio.ByteBuffer.allocate(if (version == 1) 108 else 96)
    if (version == 1) b.putLong(0L).putLong(0L).putInt(timescale.toInt).putLong(duration)
    else b.putInt(0).putInt(0).putInt(timescale.toInt).putInt(duration.toInt)
    fullBox("mvhd", version, b.array()) // trailing rate..next_track_id left zero
  }
  private def tkhd(w: Long, h: Long): Array[Byte] = {
    // v0 payload: creation..duration (20) + reserved(8) + layer/alt/
    // volume/reserved (8) + matrix (36) + width/height 16.16 (8) = 80
    val b = java.nio.ByteBuffer.allocate(80)
    b.position(72)
    b.putInt((w << 16).toInt).putInt((h << 16).toInt)
    fullBox("tkhd", 0, b.array())
  }
  private def stsd(codec: String): Array[Byte] = {
    // entry_count(4) + one minimal sample entry (8-byte header + 70
    // zero bytes standing in for the VisualSampleEntry body)
    val entry = box(codec, new Array[Byte](70))
    fullBox("stsd", 0, java.nio.ByteBuffer.allocate(4).putInt(1).array() ++ entry)
  }
  private def stsz(nSamples: Int): Array[Byte] =
    // sample_size(4, 0 = per-sample table follows) + sample_count(4)
    fullBox("stsz", 0,
      java.nio.ByteBuffer.allocate(8).putInt(0).putInt(nSamples).array())
  private def trak(w: Long, h: Long, codec: String,
      nSamples: Int = 0): Array[Byte] = {
    val stbl = if (nSamples > 0) stsd(codec) ++ stsz(nSamples) else stsd(codec)
    box("trak", tkhd(w, h) ++ box("mdia", box("minf", box("stbl", stbl))))
  }
  private def mp4(mvhdBytes: Array[Byte], traks: Array[Byte]*): Array[Byte] =
    box("ftyp", "isom0000isom".getBytes("ISO-8859-1")) ++
      box("moov", mvhdBytes ++ traks.flatten)

  test("real MP4 payloads parse container metadata through the pure-JDK box walk") {
    import spark.implicits._
    // 5 s movie (timescale 600, duration 3000), one 640x360 avc1 video
    // track + one 0x0 mp4a audio track — dims/codec must come from the
    // VIDEO track, n_tracks counts both
    val twoTrack = mp4(mvhd(600, 3000, version = 0),
      trak(0, 0, "mp4a"), trak(640, 360, "avc1", nSamples = 120))
    // version-1 mvhd (64-bit times) + 64-bit moov box size
    val v1 = box("ftyp", "isom0000isom".getBytes("ISO-8859-1")) ++
      box64("moov", mvhd(90000, 90000L * 61, version = 1) ++ trak(1920, 1080, "hev1"))
    // audio-only container: legitimately 0x0, codec from the only track
    val audioOnly = mp4(mvhd(44100, 44100 * 2, version = 0), trak(0, 0, "mp4a"))
    // garbage that sniffs as MP4 (has ftyp) but has no moov
    val garbage = box("ftyp", "isom0000isom".getBytes("ISO-8859-1")) ++
      "definitely not boxes".getBytes("UTF-8")
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", twoTrack),
      Multimodal.MediaRecord(2L, "video", v1),
      Multimodal.MediaRecord(3L, "video", audioOnly),
      Multimodal.MediaRecord(4L, "video", garbage),
      Multimodal.MediaRecord(5L, "video", "plain text".getBytes("UTF-8"))).toDS()
    val f = Multimodal.extractVideoFeatures(media).collect().map(v => v.doc_id -> v).toMap
    assert(f(1L).decoded && f(1L).duration_ms == 5000L && f(1L).timescale == 600L &&
      f(1L).width == 640L && f(1L).height == 360L && f(1L).codec == "avc1" &&
      f(1L).n_frames == 120L && // true stsz sample count, not a policy
      f(1L).n_tracks == 2L, f(1L).toString)
    // no stsz in the v1 container: n_frames falls back to the 1-fps
    // duration policy (61 s -> 61)
    assert(f(2L).n_frames == 61L, f(2L).toString)
    assert(f(2L).decoded && f(2L).duration_ms == 61000L && f(2L).timescale == 90000L &&
      f(2L).width == 1920L && f(2L).height == 1080L && f(2L).codec == "hev1", f(2L).toString)
    assert(f(3L).decoded && f(3L).duration_ms == 2000L && f(3L).width == 0L &&
      f(3L).codec == "mp4a" && f(3L).n_tracks == 1L, f(3L).toString)
    // malformed and non-video payloads degrade to the stub, never throw
    assert(!f(4L).decoded && !f(5L).decoded)
    // hostile-input guards (all → stub, decoded=false, never a wrapped
    // or garbage duration on the real path):
    val hostile = Seq(
      // plain TEXT with ascii "ftyp" at offset 4 — bytes 0-3 don't
      // decode as a plausible box size, so it never enters the walk
      Multimodal.MediaRecord(11L, "video", "xxxxftyp looks like video".getBytes("UTF-8")),
      // v0 all-ones duration = the ISO-14496-12 "unknown" sentinel
      // (fragmented-MP4 shape) — must not pass as a real ~4.3e9 ticks
      Multimodal.MediaRecord(12L, "video",
        mp4(mvhd(600, 0xFFFFFFFFL, version = 0), trak(640, 360, "avc1"))),
      // v1 duration past Long.MaxValue/1000 — duration_ms would wrap
      Multimodal.MediaRecord(13L, "video",
        mp4(mvhd(90000, Long.MaxValue / 1000L + 1L, version = 1), trak(640, 360, "avc1")))
    ).toDS()
    val hf = Multimodal.extractVideoFeatures(hostile).collect().map(v => v.doc_id -> v).toMap
    assert(!hf(11L).decoded && !hf(12L).decoded && !hf(13L).decoded,
      hf.values.map(_.toString).mkString("; "))
    assert(hf.values.forall(_.duration_ms >= 0L), "no negative duration ever")
    // fp stays md5(payload) on the real path (same dedup contract)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(twoTrack)
      .map("%02x".format(_)).mkString
    assert(f(1L).fp == md5 && f(1L).byte_len == twoTrack.length.toLong)
    // determinism across runs
    assert(Multimodal.extractVideoFeatures(media).toDF()
      .except(Multimodal.extractVideoFeatures(media).toDF()).isEmpty)
    // the generic features pass surfaces the real parse too: true
    // dims, n_frames = stsz count when present, 1-fps policy otherwise
    val g = Multimodal.extractFeatures(media).collect().map(v => v.doc_id -> v).toMap
    assert(g(1L).width == 640L && g(1L).height == 360L && g(1L).n_frames == 120L)
    assert(g(2L).n_frames == 61L)
    // an IMAGE record carrying MP4 bytes stays off the video parser
    val cross = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRecord(9L, "image", twoTrack)).toDS()).head()
    assert(!(cross.width == 640L && cross.height == 360L))
  }

  test("multimodal decode composes with Structured Streaming (file-source ingest)") {
    // the media pipeline's ingest boundary at scale is a stream of
    // arriving files; the decode pass is a pure per-partition map, so
    // the SAME operator must run unchanged over readStream — real
    // codecs included — with each file processed incrementally
    import spark.implicits._
    val dir = tmpDir("media_stream")
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    Seq(Multimodal.MediaRecord(1L, "image", png(33, 44)),
        Multimodal.MediaRecord(2L, "audio", wav(16000f, 1, 8000)))
      .toDF().repartition(1).write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Multimodal.MediaRecord]].schema)
      .parquet(dir).as[Multimodal.MediaRecord]
    val q = Multimodal.extractFeatures(stream)
      .writeStream.format("memory").queryName("media_feats")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a second file arrival decodes incrementally
      Seq(Multimodal.MediaRecord(3L, "image", png(5, 6)))
        .toDF().repartition(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val res = spark.table("media_feats").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("width"), r.getAs[Long]("height"))).toMap
      assert(res(1L) == ((33L, 44L)))        // real PNG decode, batch 1
      assert(res(2L) == ((16000L, 1L)))      // real WAV decode, batch 1
      assert(res(3L) == ((5L, 6L)))          // batch 2, incremental
      assert(res.size == 3)
    } finally q.stop()
  }

  test("frame sampling fans out n_frames rows per item, no payload carried") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
    val frames = Multimodal.sampleFrames(feats)
    val expected = feats.toDF().agg(sum("n_frames")).head().getLong(0)
    assert(frames.count() == expected)
    assert(!frames.schema.fieldNames.contains("payload"))
    // frame fingerprints are unique per (doc, idx)
    assert(frames.toDF().select("doc_id", "frame_idx").distinct().count() == expected)
  }
}
