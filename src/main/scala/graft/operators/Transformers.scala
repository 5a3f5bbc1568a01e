package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Per-record map nodes: the Spark analog of the reference's
  * `TransformerAbstract` family (`src/Transformers/TransformerAbstract.php:17-46`).
  *
  * Each is a pure `DataFrame => DataFrame`, so Catalyst sees one
  * declarative plan and can collapse/reorder projections freely —
  * none of these introduce a shuffle or leave whole-stage codegen.
  */
trait Transformer extends (DataFrame => DataFrame)

object Transformers {

  /** Identity — reference `src/Transformers/NoOpTransformer.php:15-28`. */
  case object NoOp extends Transformer {
    def apply(df: DataFrame): DataFrame = df
  }

  /** Arbitrary plan-level function — the reference's `CallableTransformer`
    * (`src/Transformers/CallableTransformer.php:18-50`). In Spark the
    * "callable" composes at the plan level, not per record, so it stays
    * in codegen whenever the body uses `functions._`. */
  final case class Callable(fn: DataFrame => DataFrame) extends Transformer {
    def apply(df: DataFrame): DataFrame = fn(df)
  }

  /** Rename fields — reference `src/Transformers/Arrays/KeyRenameTransformer.php:18-57`.
    * (The reference warns it "does not preserve incoming order", `:40`;
    * `withColumnsRenamed` preserves it, strictly better.) */
  final case class KeyRename(renames: Map[String, String]) extends Transformer {
    def apply(df: DataFrame): DataFrame = df.withColumnsRenamed(renames)
  }

  /** Drop fields — reference `src/Transformers/Arrays/KeyUnsetTransformer.php:18-53`. */
  final case class KeyUnset(cols: Seq[String]) extends Transformer {
    def apply(df: DataFrame): DataFrame = df.drop(cols: _*)
  }

  /** Defaults (fill only when absent/null) + forced overrides + add
    * default-only fields — the reference's `ArrayReplaceTransformer`
    * (`src/Transformers/Arrays/ArrayReplaceTransformer.php:18-54`):
    * `array_replace($default, $record, $override)`.
    *
    * Field-absent in PHP maps to column-missing OR null here: a missing
    * column is added as the literal; an existing column gets
    * `coalesce(col, default)`. Overrides always win. */
  final case class Replace(
      defaults: Map[String, Any] = Map.empty,
      overrides: Map[String, Any] = Map.empty) extends Transformer {
    def apply(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      val withDefaults = defaults.foldLeft(df) { case (d, (k, v)) =>
        if (have(k)) d.withColumn(k, coalesce(col(k), lit(v)))
        else d.withColumn(k, lit(v))
      }
      overrides.foldLeft(withDefaults) { case (d, (k, v)) => d.withColumn(k, lit(v)) }
    }
  }

  /** Apply one column function to every (or a selected set of) top-level
    * column(s) — the reference's `ArrayMapTransformer` (`array_map` over all
    * values, `src/Transformers/Arrays/ArrayMapTransformer.php:47`) and the
    * key-aware `ArrayWalkTransformer`
    * (`src/Transformers/Arrays/ArrayWalkTransformer.php:58`): the function
    * receives the column and its name. */
  final case class PerColumn(
      fn: (Column, String) => Column,
      only: Option[Set[String]] = None) extends Transformer {
    def apply(df: DataFrame): DataFrame = {
      val sel = df.columns.map { c =>
        // engine bookkeeping (ordered-concat tags etc.) is never user
        // data — whole-record maps must not touch the __graft_ namespace
        if (only.forall(_.contains(c)) && !c.startsWith("__graft_"))
          fn(col(c), c).as(c)
        else col(c)
      }
      df.select(sel.toIndexedSeq: _*)
    }
  }

  /** Recursive leaf-wise map: descend into arrays and structs and apply
    * `fn` at every leaf — the reference's `ArrayWalkRecursiveTransformer`
    * (`src/Transformers/Arrays/ArrayWalkRecursiveTransformer.php:56-64`,
    * leaves only). Arrays map via the higher-order `transform`; structs
    * rebuild field-wise with `withField` — all codegen'd, no UDFs. */
  final case class PerLeaf(fn: Column => Column, only: Option[Set[String]] = None) extends Transformer {
    private def descend(c: Column, t: DataType): Column = t match {
      case ArrayType(et, _) => transform(c, e => descend(e, et))
      case st: StructType =>
        st.fields.foldLeft(c)((acc, f) => acc.withField(f.name, descend(acc.getField(f.name), f.dataType)))
      case _ => fn(c)
    }
    def apply(df: DataFrame): DataFrame = {
      val sel = df.schema.fields.map { f =>
        // same __graft_ namespace rule as PerColumn
        if (only.forall(_.contains(f.name)) && !f.name.startsWith("__graft_"))
          descend(col(f.name), f.dataType).as(f.name)
        else col(f.name)
      }
      df.select(sel.toIndexedSeq: _*)
    }
  }

  /** Recursive defaults/overrides into nested structs — the reference's
    * `ArrayReplaceRecursiveTransformer`
    * (`src/Transformers/Arrays/ArrayReplaceRecursiveTransformer.php:18-54`).
    * Dotted paths address nested fields (`a.b.c`); each path gets
    * `withField` (Spark ≥3.1) so only the addressed leaf changes. */
  final case class ReplaceNested(
      defaults: Map[String, Any] = Map.empty,
      overrides: Map[String, Any] = Map.empty) extends Transformer {
    private def setPath(df: DataFrame, path: String, value: Column): DataFrame =
      path.split("\\.", 2) match {
        case Array(top)        => df.withColumn(top, value)
        case Array(top, rest)  => df.withColumn(top, col(top).withField(rest, value))
      }
    def apply(df: DataFrame): DataFrame = {
      val withDefaults = defaults.foldLeft(df) { case (d, (p, v)) =>
        if (p.contains(".")) setPath(d, p, coalesce(colPath(p), lit(v)))
        else if (d.columns.contains(p)) d.withColumn(p, coalesce(col(p), lit(v)))
        else d.withColumn(p, lit(v))
      }
      overrides.foldLeft(withDefaults) { case (d, (p, v)) => setPath(d, p, lit(v)) }
    }
    private def colPath(p: String): Column =
      p.split("\\.").toList match {
        case h :: t => t.foldLeft(col(h))((c, f) => c.getField(f))
        case Nil    => throw new IllegalArgumentException("empty path")
      }
  }
}
