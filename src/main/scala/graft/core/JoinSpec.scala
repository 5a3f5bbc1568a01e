package graft.core

import graft.sources.Source
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's `OnClause` analog
  * (`src/Extractors/OnClause.php:69-84`): which key on the flowing side
  * joins which unique key on the dimension side, whether a miss skips the
  * record (inner, `src/Extractors/UniqueKeyExtractorAbstract.php:274-279`)
  * or fills defaults (left join, `OnClause.php:80-83,136-139`), and how
  * the two records merge.
  *
  * The reference's whole WHERE-IN/key-map machinery
  * (`UniqueKeyExtractorAbstract.php:237-323`) is Spark's join execution —
  * nothing to port. What remains meaningful at 100 TB:
  *
  *  - `broadcastRight`: dimension tables that fit in memory skip the
  *    shuffle entirely (the common case for this API's m:1 joins).
  *  - `enforceUnique`: the reference *assumes* a unique right key
  *    (`docs/citizens.md:73`); m:n input would silently duplicate flowing
  *    records. Opt-in `dropDuplicates` on the key restores the contract.
  *  - `defaults`: left-join miss fill — `coalesce(col, lit(v))` per field,
  *    like the reference's default record.
  */
final case class JoinSpec(
    right: Source,
    fromKey: String,
    joinKey: String,
    leftJoin: Boolean = false,
    defaults: Map[String, Any] = Map.empty,
    broadcastRight: Boolean = true,
    enforceUnique: Boolean = false,
    rightCols: Option[Seq[String]] = None) {

  def apply(spark: SparkSession, df: DataFrame): DataFrame = {
    var dim = right.load(spark)
    rightCols.foreach { cols =>
      val need = (cols :+ joinKey).distinct
      dim = dim.select(need.map(col): _*)
    }
    if (enforceUnique) dim = dim.dropDuplicates(joinKey)
    val dimSide = if (broadcastRight) broadcast(dim) else dim
    val joined = df.join(dimSide, df(fromKey) === dim(joinKey),
      if (leftJoin) "left_outer" else "inner")
      .drop(dim(joinKey))
    defaults.foldLeft(joined) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), lit(v)))
    }
  }
}
