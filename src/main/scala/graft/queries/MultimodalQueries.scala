package graft.queries

import graft.Tables
import graft.operators.Multimodal

/** Multimodal decode/feature-extract/frame-sample plumbing
  * ([[graft.operators.Multimodal]]) exposed as driver-checkable queries.
  * The decode is a deterministic md5-derived stub (real codecs are not
  * in this environment), which is exactly what lets these have full
  * DuckDB oracles instead of rows-only checks: the *plumbing* — binary
  * payload column, typed mapPartitions decode, flatMap frame fan-out —
  * is the thing under test.
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
              |FROM feats, unnest(range(0, n_frames)) AS u(frame_idx)""".stripMargin))
  )
}
