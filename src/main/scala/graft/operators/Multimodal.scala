package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` payload column next to
  * typed metadata, and decode/feature-extraction runs as a typed
  * `mapPartitions` over the payload bytes — the Spark-side shape
  * (schema, encoders, partitioning, per-partition batching) is real and
  * tested; only the codec call itself is stubbed.
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

  /** Decoded per-item features. A real decoder would emit
    * width/height/duration from the codec; the stub derives them
    * deterministically from the payload hash so tests and the DuckDB
    * oracle can reproduce them bit-for-bit. */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, byte_len: Long, fp: String,
      width: Long, height: Long, n_frames: Long)

  final case class FrameSample(doc_id: Long, frame_idx: Long, frame_fp: String)

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** STUB decode: a real implementation would hand `payload` to an
    * image/audio codec here (not available in this environment). The
    * stand-in derives every "decoded" attribute from md5(payload), so it
    * is deterministic, engine-independent, and exercises the exact same
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

  /** Decode/feature-extract each payload. Partition-wise so a real
    * codec initializes once per partition. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real pipeline: init codec/native libs here, once per partition
      it.map(decodeStub)
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
