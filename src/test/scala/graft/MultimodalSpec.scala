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
