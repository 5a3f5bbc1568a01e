package graft

import graft.sinks.{ArrowSink, AvroSink, FixedWidthSink}
import graft.sources.{ArrowSource, AvroSource, FixedWidthSource}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen

/** Property round-trips for the r14 interchange formats (Avro, Arrow
  * IPC, fixed-width) on GENERATED flat rows — the oracle gate checks
  * one table shape; these sample the value space (negative numbers,
  * extreme magnitudes, empty strings/blobs, NULL patterns, unicode)
  * and assert write→read is the identity. Same sampled-Gen harness as
  * TransformerPropsSpec (offline dependency set). */
class FormatPropsSpec extends SparkSuite {

  private val trials = 6
  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    (1 to trials).foreach { i =>
      body(g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
        .getOrElse(g.sample.get))
    }

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("i", IntegerType, nullable = true),
    StructField("b", BinaryType, nullable = true)))

  // strings: unicode, empty, long runs — but no trailing whitespace or
  // line breaks (the fixed-width generator filters further)
  private val strGen: Gen[String] = Gen.oneOf(
    Gen.const(""), Gen.alphaNumStr.map(_.take(24)),
    Gen.const("日本語テキスト"), Gen.const("a\"b'c,d;e"),
    Gen.alphaLowerStr.map(s => s.take(6) + "é" + s.take(4)))
  private val dblGen: Gen[java.lang.Double] = Gen.oneOf(
    Gen.const(null: java.lang.Double),
    Gen.chooseNum(-1e12, 1e12).map(d => java.lang.Double.valueOf(d)),
    Gen.oneOf(Seq(0.0, -0.0, 1e-300, -1e300, 4.9e-324).map(java.lang.Double.valueOf)))
  private val binGen: Gen[Array[Byte]] = Gen.oneOf(
    Gen.const(null: Array[Byte]), Gen.const(Array.empty[Byte]),
    Gen.listOfN(16, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  private def rowGen(id: Long): Gen[Row] = for {
    s <- Gen.option(strGen); d <- dblGen
    i <- Gen.option(Gen.chooseNum(Int.MinValue, Int.MaxValue))
    b <- binGen
  } yield Row(id, s.orNull, d, i.map(Int.box).orNull, b)

  private val rowsGen: Gen[Seq[Row]] =
    Gen.chooseNum(1, 40).flatMap(n =>
      Gen.sequence[Seq[Row], Row]((1 to n).map(i => rowGen(i.toLong))))

  /** Value-level row key: doubles by bits, binary by content. */
  private def key(r: Row) = (r.getLong(0), Option(r.getString(1)),
    Option(r.get(2)).map(d => java.lang.Double.doubleToLongBits(d.asInstanceOf[Double])),
    Option(r.get(3)),
    Option(r.getAs[Array[Byte]](4)).map(_.toSeq))

  private def roundTrip(name: String,
      write: org.apache.spark.sql.DataFrame => Unit,
      read: () => org.apache.spark.sql.DataFrame,
      rows: Seq[Row]): Unit = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema).repartition(2)
    write(df)
    val back = read().collect().map(key).toSeq.sorted(Ordering.by((t: Any) => t.toString))
    val orig = rows.map(key).sorted(Ordering.by((t: Any) => t.toString))
    assert(back == orig, s"$name round-trip diverged: ${back.take(3)} vs ${orig.take(3)}")
  }

  test("Avro container round-trip is the identity on generated flat rows") {
    forAll(rowsGen) { rows =>
      val out = tmpDir("avro_props") + "/out"
      roundTrip("avro",
        AvroSink(out).write,
        () => AvroSource(out, schema = Some(schema)).load(spark), rows)
    }
  }

  test("Arrow IPC round-trip is the identity on generated flat rows") {
    forAll(rowsGen) { rows =>
      val out = tmpDir("arrow_props") + "/out"
      roundTrip("arrow",
        ArrowSink(out, batchRows = 7).write, // force multi-batch files
        () => ArrowSource(out, schema = Some(schema)).load(spark), rows)
    }
  }

  test("fixed-width round-trip is the identity on its representable domain") {
    // fixed-width cannot carry NULLs, trailing spaces, line breaks or
    // binary — generate inside the representable domain (the sink is
    // loud outside it, pinned in FileFormatsSpec)
    val fwSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = false),
      StructField("d", DoubleType, nullable = false)))
    val fwRow: Long => Gen[Row] = id => for {
      s <- Gen.alphaNumStr.map(s => if (s.isEmpty) "x" else s.take(12))
      d <- Gen.chooseNum(-1e9, 1e9)
    } yield Row(id, s, d)
    val fwRows = Gen.chooseNum(1, 30).flatMap(n =>
      Gen.sequence[Seq[Row], Row]((1 to n).map(i => fwRow(i.toLong))))
    forAll(fwRows) { rows =>
      import scala.jdk.CollectionConverters._
      val out = tmpDir("fw_props") + "/out"
      val layout = Seq("id" -> 12, "s" -> 14, "d" -> 26)
      val df = spark.createDataFrame(rows.asJava, fwSchema).repartition(2)
      FixedWidthSink(out, layout).write(df)
      val back = FixedWidthSource(out, layout,
          types = Map("id" -> LongType, "d" -> DoubleType)).load(spark)
        .collect().map(r => (r.getLong(0), r.getString(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
      val orig = rows.map(r => (r.getLong(0), r.getString(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
      assert(back == orig, s"fixed-width diverged: ${(back diff orig).take(3)}")
    }
  }
}
