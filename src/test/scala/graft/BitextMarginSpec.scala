package graft

import org.apache.spark.sql.functions._

/** Pins the PROPERTY bitext_margin exists for: a raw-cosine best match
  * is only accepted when it is DISTINCTIVE relative to both endpoints'
  * neighborhoods. A synthetic corpus makes the cut exact:
  *
  *  - side A (even ids 0,2,4,6): the four axis unit vectors;
  *  - side B: b1 = (0.8, .35, .35, .35) — a genuine partner for a0
  *    (cos ≈ .797 vs .349 elsewhere); b3=b5=b7 = the uniform blanket
  *    (.5,.5,.5,.5) — cos exactly .5 to EVERY anchor, the
  *    indiscriminate-neighborhood case.
  *
  * For a0 the margin is ≈ 1.54 (accepted); for a2/a4/a6 the best match
  * is the blanket but the margin is ≈ 1.04 — under the 1.05 cut —
  * because an equally-similar-to-everything neighborhood inflates both
  * k-NN sums. A raw-cosine threshold at any value ≤ 0.5 would have
  * admitted all three blanket pairs.
  */
class BitextMarginSpec extends SparkSuite {

  test("margin accepts the distinctive pair, rejects the uniform-blanket matches") {
    import spark.implicits._
    val dir = tmpDir("bitext_synth")
    val rows = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0f, 1f, 0f, 0f)),
      (4L, Seq(0f, 0f, 1f, 0f)),
      (6L, Seq(0f, 0f, 0f, 1f)),
      (1L, Seq(0.8f, 0.35f, 0.35f, 0.35f)),
      (3L, Seq(0.5f, 0.5f, 0.5f, 0.5f)),
      (5L, Seq(0.5f, 0.5f, 0.5f, 0.5f)),
      (7L, Seq(0.5f, 0.5f, 0.5f, 0.5f)))
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.queries.SimilarityQueries.defs
      .find(_.name == "bitext_margin").get.fn(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    // a0 ↔ b1: distinctive mutual pair — accepted
    assert(out(0L) == ((1L, 1L)), out)
    // a2/a4/a6: best raw match is the blanket (lowest id 3 on the
    // 3-way cosine tie), but margin lands under the cut — rejected
    Seq(2L, 4L, 6L).foreach { a =>
      assert(out(a) == ((3L, 0L)), s"anchor $a: ${out(a)}")
    }
    // sanity on the margin values themselves: accepted pair well above
    // the cut, blanket pairs just below it (the discriminating zone)
    val margins = graft.queries.SimilarityQueries.defs
      .find(_.name == "bitext_margin").get.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(margins(0L) > 1500000L, margins)
    assert(margins(2L) < 1050000L && margins(2L) > 1000000L, margins)
  }
}
