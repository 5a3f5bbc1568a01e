package graft

import graft.queries.SimilarityQueries
import org.apache.spark.sql.functions._

/** Pins `embedding_quantize`'s numeric promises: codes stay in the int8
  * range, per-vector reconstruction error respects the worst-case
  * half-step bound, and degenerate constant dimensions quantize
  * losslessly to code 0.
  */
class QuantizeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("codes in 0..255 and error within the half-step bound") {
    val out = SimilarityQueries.defs.find(_.name == "embedding_quantize").get
      .fn(spark, dir)
    val rows = out.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(3) <= 255L,
        s"codes out of range: ${r}")
    }
    // worst case per dim: (step/2)^2 with step = range/255; bound the
    // vector SSE by dims * max-range half-step (+1 pico per dim for the
    // rounding of each term)
    val ranges = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(posexplode(col("embedding")))
      .groupBy(col("pos")).agg((max(col("col")) - min(col("col"))).as("rg"))
      .agg(max(col("rg"))).head().getFloat(0).toDouble
    val boundPico = 64.0 * math.pow(ranges / 255.0 / 2.0, 2) * 1e12 + 64.0
    rows.foreach(r => assert(r.getLong(1) <= boundPico.toLong,
      s"sse ${r.getLong(1)} above bound $boundPico"))
  }

  test("ann_sq8: quantized serving keeps high recall on real error") {
    val rows = SimilarityQueries.defs.find(_.name == "ann_sq8").get
      .fn(spark, dir).collect()
    assert(rows.length == 8)
    val avgRecall = rows.map(_.getLong(3)).sum.toDouble / rows.length / 1e6
    assert(avgRecall >= 0.8, s"avg recall $avgRecall")
    // the audit is not vacuous: quantization introduces real error
    // (per-vector SSE > 0 for essentially every vector)
    val withErr = SimilarityQueries.defs.find(_.name == "embedding_quantize").get
      .fn(spark, dir).filter(org.apache.spark.sql.functions.col("sse_pico") > 0).count()
    assert(withErr > 400, s"only $withErr vectors carry quantization error")
  }

  test("constant dimension quantizes losslessly to code 0") {
    import spark.implicits._
    val d = tmpDir("quant")
    Seq((1L, Array(1.5f, 0.0f), 0), (2L, Array(1.5f, 2.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = SimilarityQueries.defs.find(_.name == "embedding_quantize").get
      .fn(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // dim 1 is constant → code 0, zero error; dim 2 spans [0,2] → codes
    // 0 and 255 exactly at the endpoints, zero error there too
    assert(out(1L) == ((0L, 0L, 0L)))
    assert(out(2L) == ((0L, 0L, 255L)))
  }
}
