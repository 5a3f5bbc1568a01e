package graft

import graft.queries.SimilarityQueries
import org.apache.spark.sql.functions._

/** Pins `embedding_gram`'s distributed partial-triangle fold against a
  * driver-scale brute-force accumulation: identical integer micro-point
  * arithmetic applied vector by vector on the driver must reproduce
  * every one of the D(D+1)/2 cells — partition boundaries, the
  * map-side triangle fold, and the (i, j) labeling all cancel out or
  * they don't.
  */
class GramSpec extends SparkSuite {

  test("embedding_gram equals the driver-scale brute-force fold") {
    val dir = "/root/testdata/sf0.001"
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("e"))
      .collect().map(_.getSeq[Double](0).toArray)
    val d = vecs.head.length
    assert(d == 64)
    val acc = Array.ofDim[Long](d, d)
    vecs.foreach { v =>
      val u = v.map(x => math.floor(x * 1e6 + 0.5).toLong)
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) { acc(i)(j) += u(i) * u(j); j += 1 }
        i += 1
      }
    }
    val got = SimilarityQueries.defs.find(_.name == "embedding_gram").get
      .fn(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.size == d * (d + 1) / 2)
    for (i <- 0 until d; j <- i until d)
      assert(got((i + 1L, j + 1L)) == acc(i)(j),
        s"cell ($i, $j): ${got((i + 1L, j + 1L))} != ${acc(i)(j)}")
    // the diagonal is a sum of squares — strictly positive on any
    // non-degenerate corpus (and the PCA variance input downstream)
    for (i <- 1L to d.toLong) assert(got((i, i)) > 0L)
  }
}
