package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Pins `dedup_semantic` (SemDeDup shape — k-means cells, within-cell
  * cosine prune). The query has no SQL oracle (centroid float means are
  * not bit-stable cross-engine), so correctness is pinned here instead:
  * the keep/drop rule must agree EXACTLY with an independently computed
  * brute-force pass over the same cell assignment.
  */
class SemDedupSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("dedup_semantic matches brute-force within-cell cosine pruning") {
    val (assigned, _) = graft.queries.DedupQueries.semanticDrops(
      spark, dir, k = 8, iters = 3, tau = 0.4)
    // independent brute force: collect the (small) assignment, compute
    // all within-cell pairs in Scala, drop = has lower-id mate >= tau
    val rows = assigned
      .select(col("vec_id"), col("c_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dab = 0.0; var daa = 0.0; var dbb = 0.0
      var i = 0
      while (i < a.length) {
        dab += a(i).toDouble * b(i).toDouble
        daa += a(i).toDouble * a(i).toDouble
        dbb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      // same rounding contract as TextFunctions.cosine
      BigDecimal(dab / math.sqrt(daa) / math.sqrt(dbb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expectDropped = (for {
      Seq((idA, _, embA), (idB, _, embB)) <-
        rows.groupBy(_._2).values.flatMap(_.toSeq.combinations(2))
      hi = if (idA > idB) (idA, embA, embB) else (idB, embB, embA)
      if cos(hi._2, hi._3) >= 0.4
    } yield hi._1).toSet

    val kept = SparkEntry.queries("dedup_semantic")(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val all = rows.map(_._1).toSet
    assert(all.size === 500)
    assert((all -- kept) === expectDropped) // exact keep/drop agreement
    assert(expectDropped.nonEmpty)          // the corpus has semantic dups
    spark.catalog.clearCache()              // release semanticDrops' persist
  }

  test("cell-count sizing: floor 8, one cell per ~256 KiB, capped") {
    import graft.queries.DedupQueries.{cellCount, CellTargetBytes}
    // all testdata SFs sit on the floor — the exactness tests above and
    // the driver's rows-only check rely on k = 8 at test scale
    assert(cellCount(0) == 8)
    assert(cellCount(BigInt(800000)) == 8) // sf0.1 embeddings file size
    // past the floor, k tracks input so |cell| stays bounded (the
    // within-cell self-join is |cell|² — cells must not grow with the
    // corpus)
    assert(cellCount(CellTargetBytes * 100) == 100)
    assert(cellCount(BigInt(1) << 62) == (1 << 20)) // cap, no overflow
    assert(cellCount(CellTargetBytes + 1) >= cellCount(CellTargetBytes))
  }

  test("dropped vectors always have a kept lower-id cell-mate justifying the drop") {
    val (assigned, drops) = graft.queries.DedupQueries.semanticDrops(
      spark, dir, k = 8, iters = 3, tau = 0.4)
    val justified = drops.as("d")
      .join(assigned.as("x"), col("d.vec_id") === col("x.vec_id"))
      .join(assigned.as("w"),
        col("w.c_id") === col("x.c_id") && col("w.vec_id") < col("x.vec_id"))
      .filter(cosineFast(col("x.embedding"), col("w.embedding"),
        col("x.nrm"), col("w.nrm")) >= 0.4)
      .select(col("d.vec_id")).distinct().count()
    assert(justified === drops.count()) // every drop has a witness
    spark.catalog.clearCache()
  }
}
