package graft

import graft.operators.Transformers._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TransformersSpec extends SparkSuite {
  import spark.implicits._

  test("Replace: defaults fill absent/null, overrides always win (FIXTURES A.3)") {
    // reference tests/Arrays/ArrayReplaceTransformerTest.php:15-53 vector:
    // defaults {one: onedefault, n42: 1337}, overrides {q: no},
    // input {q: yes, oh: my} → {one: onedefault, n42: 1337, q: no, oh: my}
    val in = Seq(("yes", "my")).toDF("q", "oh")
    val out = Replace(
      defaults = Map("one" -> "onedefault", "n42" -> 1337),
      overrides = Map("q" -> "no"))(in)
    val r = out.select("one", "n42", "q", "oh").head()
    assert(r == Row("onedefault", 1337, "no", "my"))

    // null counts as absent (Spark's analog of a missing array key)
    val withNull = Seq((Option.empty[String], "x")).toDF("one", "oh")
    val out2 = Replace(defaults = Map("one" -> "onedefault"))(withNull)
    assert(out2.select("one").head().getString(0) == "onedefault")
  }

  test("KeyRename + KeyUnset") {
    val in = Seq((1, "a", true)).toDF("id", "name", "flag")
    val out = KeyUnset(Seq("flag"))(KeyRename(Map("name" -> "label"))(in))
    assert(out.columns.toSeq == Seq("id", "label"))
  }

  test("PerColumn: trim every string field (docs/citizens.md:272 use case)") {
    val in = Seq(("  a  ", " b", 1)).toDF("x", "y", "n")
    val out = PerColumn((c, _) => trim(c), only = Some(Set("x", "y")))(in)
    assert(out.head() == Row("a", "b", 1))
  }

  test("PerColumn key-aware (ArrayWalk with key)") {
    val in = Seq(("v1", "v2")).toDF("a", "b")
    val out = PerColumn((c, name) => concat(lit(name), lit("="), c))(in)
    assert(out.head() == Row("a=v1", "b=v2"))
  }

  test("PerLeaf descends arrays and structs (ArrayWalkRecursive)") {
    val in = Seq((Seq(1, 2, 3), (10, 20))).toDF("arr", "st")
    val out = PerLeaf(c => c * 2)(in)
    val r = out.head()
    assert(r.getSeq[Int](0) == Seq(2, 4, 6))
    assert(r.getStruct(1) == Row(20, 40))
  }

  test("ReplaceNested: dotted-path defaults and overrides") {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("meta", StructType(Seq(
        StructField("lang", StringType), StructField("src", StringType))))))
    val in = spark.createDataFrame(
      java.util.List.of(Row(1, Row(null, "s1")), Row(2, Row("en", "s2"))), schema)
    val out = ReplaceNested(
      defaults = Map("meta.lang" -> "unknown"),
      overrides = Map("meta.src" -> "forced"))(in)
    val rows = out.orderBy("id").collect()
    assert(rows(0).getStruct(1) == Row("unknown", "forced"))
    assert(rows(1).getStruct(1) == Row("en", "forced"))
  }
}
