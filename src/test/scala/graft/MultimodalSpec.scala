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
