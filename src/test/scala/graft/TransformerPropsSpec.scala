package graft

import graft.operators.Transformers
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen

/** Property tests for transformer algebra (SURVEY §5: ScalaCheck for
  * rename/drop/defaults round-trips). Runs on driver-built frames — the
  * properties are schema/value laws, independent of data volume.
  * Uses scalacheck Gen directly (sampled trials) to stay within the
  * offline-resolvable dependency set. */
class TransformerPropsSpec extends SparkSuite {

  private val trials = 12
  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    (1 to trials).foreach { i =>
      body(g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
        .getOrElse(g.sample.get))
    }
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(g1, g2))(t => body(t._1, t._2))

  private val colName = Gen.identifier.map(s => "c_" + s.take(8))
  private val schemaGen: Gen[List[String]] = // padded so size >= 2 always
    Gen.listOfN(4, colName).map(l => (l ++ List("c_pad1", "c_pad2")).distinct)

  private def frame(cols: List[String]) = {
    val schema = StructType(cols.map(StructField(_, IntegerType)))
    val rows = (0 until 3).map(i => Row.fromSeq(cols.indices.map(j => i * 10 + j)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("rename then inverse-rename is identity") {
    forAll(schemaGen) { cols =>
      val df = frame(cols)
      val fwd = cols.map(c => c -> s"${c}_x").toMap
      val back = fwd.map(_.swap)
      val out = Transformers.KeyRename(back)(Transformers.KeyRename(fwd)(df))
      assert(out.columns.toSeq == df.columns.toSeq)
      assert(out.except(df).isEmpty && df.except(out).isEmpty)
    }
  }

  test("KeyUnset removes exactly the requested columns, keeps order") {
    forAll(schemaGen) { cols =>
      val df = frame(cols)
      val drop = cols.take(1)
      val out = Transformers.KeyUnset(drop)(df)
      assert(out.columns.toSeq == cols.filterNot(drop.contains))
    }
  }

  test("Replace defaults are idempotent; overrides win over defaults") {
    forAll(schemaGen, Gen.chooseNum(-100, 100)) { (cols, v) =>
      val df = frame(cols)
      val t = Transformers.Replace(
        defaults = Map(cols.head -> v, "added" -> v),
        overrides = Map(cols.last -> v))
      val once = t(df)
      val twice = t(once)
      assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
      // existing non-null values are NOT overwritten by defaults
      assert(once.select(cols.head).except(df.select(cols.head)).isEmpty)
      // overrides always applied
      assert(once.select(cols.last).distinct().collect().map(_.get(0)).toSet == Set(v))
      // default-only fields are added
      assert(once.columns.contains("added"))
    }
  }

  test("PerColumn touches only selected columns") {
    forAll(schemaGen) { cols =>
      val df = frame(cols)
      val target = cols.head
      val out = Transformers.PerColumn((c, _) => c * 2, only = Some(Set(target)))(df)
      assert(out.columns.toSeq == df.columns.toSeq)
      assert(out.select(cols.last).except(df.select(cols.last)).isEmpty)
      val doubled = df.select((org.apache.spark.sql.functions.col(target) * 2).as(target))
      assert(out.select(target).except(doubled).isEmpty)
    }
  }
}
