package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal decode/feature-extract/frame-sample plumbing
  * ([[graft.operators.Multimodal]]) exposed as driver-checkable queries.
  * The real decode legs (JDK ImageIO images, javax.sound.sampled audio,
  * pure-JDK ISO-BMFF video container metadata) are spec-gated against
  * synthesized payloads; over THIS corpus the payloads are text bytes,
  * so every oracle covers the deterministic md5-derived stub leg —
  * which is exactly what lets these have full DuckDB oracles instead of
  * rows-only checks: the *plumbing* — binary payload column, typed
  * mapPartitions decode, flatMap frame fan-out — is the thing under
  * test end-to-end, and the decode seam is pinned separately.
  */
object MultimodalQueries {

  private val featsCte =
    """WITH m AS (SELECT doc_id,
      |    list_extract(['image', 'audio', 'video'], CAST(doc_id % 3 + 1 AS INT)) AS media_type,
      |    text FROM documents),
      |f AS (SELECT doc_id, media_type,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |    md5(text) AS fp,
      |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
      |  FROM m),
      |feats AS (SELECT doc_id, media_type, byte_len, fp,
      |    320 + h % 1600 AS width,
      |    240 + (h // 7) % 840 AS height,
      |    CASE WHEN media_type = 'video' THEN 1 + h % 16 ELSE CAST(1 AS BIGINT) END AS n_frames
      |  FROM f)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef("multimodal_features",
      (s, dir) => Multimodal.features(s, Tables(s, dir, "documents")),
      Some(s"$featsCte\nSELECT doc_id, media_type, byte_len, fp, width, height, n_frames FROM feats")),

    QueryDef("multimodal_frames",
      (s, dir) => Multimodal.frames(s, Tables(s, dir, "documents")),
      Some(s"""$featsCte
              |SELECT doc_id, u.frame_idx,
              |  md5(fp || ':' || CAST(u.frame_idx AS VARCHAR)) AS frame_fp
              |FROM feats, unnest(range(0, n_frames)) AS u(frame_idx)""".stripMargin)),

    // CONTENT-HASH dedup of media payloads — the modality twin of
    // `dedup_exact`: identical bytes (mirrored uploads, re-crawled
    // assets) collapse on the payload fingerprint the decode pass
    // already computed, per media type. The scale rules of the module
    // hold: the 16-byte fp is the shuffle key, the payload itself
    // never enters an exchange; the canonical survivor is the min
    // doc_id (the corpus-stable pick). n_copies > 1 rows are the
    // storage the dedup reclaims — at 100 TB of media that figure,
    // not document text, dominates the bill.
    QueryDef("multimodal_dedup",
      (s, dir) => Multimodal.features(s, Tables(s, dir, "documents"))
        .groupBy(col("media_type"), col("fp"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc"),
          sum(col("byte_len")).as("bytes_total")),
      Some(s"""$featsCte
              |SELECT media_type, fp, COUNT(*) AS n_copies,
              |  MIN(doc_id) AS keep_doc,
              |  CAST(SUM(byte_len) AS BIGINT) AS bytes_total
              |FROM feats GROUP BY 1, 2""".stripMargin)),

    // Typed AUDIO features over the audio-typed media — the honest-
    // column-names path ([[Multimodal.extractAudioFeatures]]): real
    // WAV/AIFF/AU decode where the payload is readable (pinned against
    // synthesized WAVs in MultimodalSpec), deterministic hash-derived
    // stand-ins elsewhere. The synthetic corpus payloads are text
    // bytes, so this oracle covers the stub leg end-to-end (plumbing +
    // formulas, incl. the integer-exact duration); the real-decode leg
    // is spec-gated. Scale posture: pure per-partition map over an
    // already-filtered modality slice; payload never shuffles.
    QueryDef("multimodal_audio",
      (s, dir) => Multimodal.extractAudioFeatures(
          Multimodal.mediaFromDocuments(Tables(s, dir, "documents"))
            .filter(_.media_type == "audio"))
        .toDF()
        .select(col("doc_id"), col("byte_len"), col("fp"),
          col("sample_rate"), col("channels"), col("n_samples"),
          col("duration_ms"), col("decoded").cast("long").as("decoded")),
      Some("""WITH m AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1),
             |f AS (SELECT doc_id,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |    md5(text) AS fp,
             |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
             |  FROM m)
             |SELECT doc_id, byte_len, fp,
             |  8000 + (h % 5) * 8000 AS sample_rate,
             |  1 + h % 2 AS channels,
             |  1000 + h % 100000 AS n_samples,
             |  (1000 + h % 100000) * 1000 // (8000 + (h % 5) * 8000) AS duration_ms,
             |  CAST(0 AS BIGINT) AS decoded
             |FROM f""".stripMargin)),

    // Typed VIDEO container metadata over the video-typed media —
    // [[Multimodal.extractVideoFeatures]]: a REAL pure-JDK ISO-BMFF
    // box parse (mvhd duration/timescale, tkhd display dimensions,
    // stsd codec fourcc, stsz true frame count, trak count) where the
    // payload is a readable
    // MP4 (pinned against synthesized MP4 headers in MultimodalSpec —
    // both mvhd versions, 64-bit box sizes, audio-only containers,
    // truncated garbage), deterministic hash-derived stand-ins
    // elsewhere. The synthetic corpus payloads are text bytes, so this
    // oracle covers the stub leg end-to-end (plumbing + integer-exact
    // formulas); the real-parse leg is spec-gated, exactly the
    // `multimodal_audio` pattern. Frame/pixel decode remains the
    // documented stub seam — container metadata needs no codec, which
    // is why this leg can be real in a codec-free environment. Scale
    // posture: pure per-partition map over the modality slice; the
    // payload never enters a shuffle.
    QueryDef("multimodal_video",
      (s, dir) => Multimodal.extractVideoFeatures(
          Multimodal.mediaFromDocuments(Tables(s, dir, "documents"))
            .filter(_.media_type == "video"))
        .toDF()
        .select(col("doc_id"), col("byte_len"), col("fp"),
          col("duration_ms"), col("timescale"), col("width"), col("height"),
          col("codec"), col("n_frames"), col("n_tracks"),
          col("decoded").cast("long").as("decoded")),
      Some("""WITH m AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
             |f AS (SELECT doc_id,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |    md5(text) AS fp,
             |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
             |  FROM m)
             |SELECT doc_id, byte_len, fp,
             |  1000 + h % 600000 AS duration_ms,
             |  600 * (1 + h % 4) AS timescale,
             |  320 + h % 1600 AS width,
             |  240 + (h // 7) % 840 AS height,
             |  list_extract(['avc1', 'hev1', 'vp09', 'av01'], CAST(h % 4 + 1 AS INT)) AS codec,
             |  24 * (1000 + h % 600000) // 1000 AS n_frames,
             |  1 + h % 2 AS n_tracks,
             |  CAST(0 AS BIGINT) AS decoded
             |FROM f""".stripMargin))
  )
}
