package graft

import graft.sinks.AvroSink
import graft.sources.{AvroConv, AvroSource}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro container round-trip edges the oracle gate's TPC-H data cannot
  * reach: nullable fields carrying actual NULLs, binary and boolean and
  * float columns, the explicit-schema path (the gate query uses the
  * sniffed writer schema), the flat-primitives scope guard, and the
  * empty-directory sniff error. */
class AvroSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("ratio", FloatType, nullable = true),
    StructField("flag", BooleanType, nullable = true),
    StructField("blob", BinaryType, nullable = true)))

  private val rows = Seq(
    Row(1L, "ann", 2.5, 0.5f, true, Array[Byte](1, 2, 3)),
    Row(2L, null, null, null, null, null),
    Row(3L, "bo\nb", -0.0, Float.NaN, false, Array.empty[Byte]))

  test("all supported types + NULLs survive the container round-trip") {
    val dir = tmpDir("avro_rt")
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema)
    AvroSink(s"$dir/out").write(df)
    // explicit-schema read (the gate query covers the sniffed path)
    val back = AvroSource(s"$dir/out", schema = Some(schema)).load(spark)
    assert(back.schema == schema)
    val got = back.collect().sortBy(_.getLong(0))
    assert(got(0).getString(1) == "ann" && got(0).getDouble(2) == 2.5 &&
      got(0).getFloat(3) == 0.5f && got(0).getBoolean(4) &&
      got(0).getAs[Array[Byte]](5).toSeq == Seq[Byte](1, 2, 3))
    assert((1 to 5).forall(got(1).isNullAt), s"row 2 must be all-NULL: ${got(1)}")
    // -0.0 and NaN are bit-level round-trips, newline in a string survives
    assert(got(2).getString(1) == "bo\nb")
    assert(java.lang.Double.doubleToRawLongBits(got(2).getDouble(2)) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
    assert(got(2).getFloat(3).isNaN)
    assert(got(2).getAs[Array[Byte]](5).isEmpty)
  }

  test("sniffed writer schema matches the written StructType") {
    val dir = tmpDir("avro_sniff")
    import scala.jdk.CollectionConverters._
    AvroSink(s"$dir/out").write(spark.createDataFrame(rows.asJava, schema))
    val sniffed = AvroSource(s"$dir/out").load(spark)
    // the sink writes every field through AvroConv; non-nullable id
    // stays non-nullable in the round-tripped schema
    assert(sniffed.schema.fieldNames.toSeq == schema.fieldNames.toSeq)
    assert(sniffed.schema("id").dataType == LongType && !sniffed.schema("id").nullable)
    assert(sniffed.count() == 3)
  }

  test("explicit schema naming a field absent from the writer schema fails loudly") {
    // GenericRecord.get(name) returns null for unknown fields — without
    // the guard a typo'd field reads as a silently all-NULL column.
    val dir = tmpDir("avro_badfield")
    import scala.jdk.CollectionConverters._
    AvroSink(s"$dir/out").write(spark.createDataFrame(rows.asJava, schema))
    val typoed = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("nmae", StringType, nullable = true))) // sic
    val e = intercept[IllegalArgumentException] {
      AvroSource(s"$dir/out", schema = Some(typoed)).load(spark).count()
    }
    assert(e.getMessage.contains("nmae") && e.getMessage.contains("writer schema"),
      e.getMessage)
    // and a correct SUBSET projection still reads fine
    val subset = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true)))
    assert(AvroSource(s"$dir/out", schema = Some(subset)).load(spark).count() == 3)
    // a matching NAME with a mismatched TYPE fails just as loudly
    // (StringType over the writer's long would otherwise pass the
    // name guard and misread deep inside a task) — r15 ADVICE
    val mistyped = StructType(Seq(
      StructField("id", StringType, nullable = false)))
    val e2 = intercept[IllegalArgumentException] {
      AvroSource(s"$dir/out", schema = Some(mistyped)).load(spark).count()
    }
    assert(e2.getMessage.contains("id") && e2.getMessage.contains("disagree"),
      e2.getMessage)
    // a matching name AND type but explicit nullable=false over the
    // writer's [null, string] union fails up front too — nulls would
    // otherwise reach the non-nullable column mid-task (r16 ADVICE:
    // the type-only guard missed exactly this)
    val nonNullable = StructType(Seq(
      StructField("name", StringType, nullable = false)))
    val e3 = intercept[IllegalArgumentException] {
      AvroSource(s"$dir/out", schema = Some(nonNullable)).load(spark).count()
    }
    assert(e3.getMessage.contains("name") &&
      e3.getMessage.contains("non-nullable"), e3.getMessage)
  }

  test("scope guards are loud: nested types rejected, empty dir named") {
    import scala.jdk.CollectionConverters._
    val nested = StructType(Seq(StructField("a",
      ArrayType(LongType), nullable = true)))
    val e1 = intercept[IllegalArgumentException] {
      AvroConv.toAvroSchema(nested, "r")
    }
    assert(e1.getMessage.contains("flat primitives"))
    val dir = tmpDir("avro_empty")
    val e2 = intercept[IllegalArgumentException] {
      AvroSource(dir).load(spark).count()
    }
    assert(e2.getMessage.contains("no data files"))
  }
}
