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
  *  - `broadcastRight`: `None` (default) lets Catalyst/AQE pick the
  *    build side from actual sizes — a dimension under the broadcast
  *    threshold skips the shuffle, one that grew past it (dims scale
  *    with the data) degrades to a shuffle join instead of OOMing.
  *    `Some(true)` forces the hint for dims known fixed-size at every
  *    scale (calendar, country codes); `Some(false)` forbids it.
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
    broadcastRight: Option[Boolean] = None,
    enforceUnique: Boolean = false,
    rightCols: Option[Seq[String]] = None) {

  def apply(spark: SparkSession, df: DataFrame): DataFrame = {
    var dim = right.load(spark)
    rightCols.foreach { cols =>
      val need = (cols :+ joinKey).distinct
      dim = dim.select(need.map(col): _*)
    }
    if (enforceUnique) dim = dim.dropDuplicates(joinKey)
    val dimSide = broadcastRight match {
      case Some(true)  => broadcast(dim)
      case Some(false) => dim.hint("shuffle_merge")
      case None        => dim
    }
    val joined = df.join(dimSide, df(fromKey) === dim(joinKey),
      if (leftJoin) "left_outer" else "inner")
      .drop(dim(joinKey))
    defaults.foldLeft(joined) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), lit(v)))
    }
  }
}
