package graft

import graft.sinks.ArrowSink
import graft.sources.{ArrowConv, ArrowSource}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Arrow IPC round-trip edges the oracle gate's TPC-H data cannot
  * reach: NULLs in every supported type, binary/boolean/float columns,
  * NaN/-0.0 bit-exactness, MULTI-BATCH files (batchRows below the row
  * count so the writer emits several record batches), the explicit-
  * schema path, and the flat-primitives scope guard. */
class ArrowSpec extends SparkSuite {

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
    Row(3L, "bo\nb", -0.0, Float.NaN, false, Array.empty[Byte]),
    Row(4L, "日本語", 1e308, -1.5f, true, Array[Byte](-1)))

  test("all supported types + NULLs survive; multi-batch files; sniffed schema") {
    val dir = tmpDir("arrow_rt")
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema).repartition(1)
    // batchRows = 2 over 4 rows -> two record batches in one file
    ArrowSink(s"$dir/out", batchRows = 2).write(df)
    val files = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".arrow"))
    assert(files.length == 1, files.mkString(","))
    // sniffed-schema read (field names + types from the IPC footer)
    val back = ArrowSource(s"$dir/out").load(spark)
    assert(back.schema.fieldNames.toSeq == schema.fieldNames.toSeq)
    assert(back.schema("id").dataType == LongType && !back.schema("id").nullable)
    val got = back.collect().sortBy(_.getLong(0))
    assert(got.length == 4)
    assert(got(0).getString(1) == "ann" && got(0).getDouble(2) == 2.5 &&
      got(0).getBoolean(4) && got(0).getAs[Array[Byte]](5).toSeq == Seq[Byte](1, 2, 3))
    assert((1 to 5).forall(got(1).isNullAt), s"row 2 must be all-NULL: ${got(1)}")
    assert(got(2).getString(1) == "bo\nb")
    assert(java.lang.Double.doubleToRawLongBits(got(2).getDouble(2)) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
    assert(got(2).getFloat(3).isNaN && got(2).getAs[Array[Byte]](5).isEmpty)
    assert(got(3).getString(1) == "日本語" && got(3).getDouble(2) == 1e308)
    // explicit-schema path agrees (binary compared by value, not array
    // identity)
    def key(r: Row) = (r.getLong(0), Option(r.getString(1)),
      Option(r.get(2)).map(d =>
        java.lang.Double.doubleToLongBits(d.asInstanceOf[Double])),
      Option(r.get(3)).map(f =>
        java.lang.Float.floatToIntBits(f.asInstanceOf[Float])),
      Option(r.get(4)), Option(r.getAs[Array[Byte]](5)).map(_.toSeq))
    val explicit = ArrowSource(s"$dir/out", schema = Some(schema)).load(spark)
    assert(explicit.collect().map(key).toSet == back.collect().map(key).toSet)
  }

  test("scope guards are loud: nested types rejected, empty dir named") {
    val nested = StructType(Seq(StructField("a", ArrayType(LongType), nullable = true)))
    val e1 = intercept[IllegalArgumentException] { ArrowConv.toArrowSchema(nested) }
    assert(e1.getMessage.contains("flat primitives"))
    val dir = tmpDir("arrow_empty")
    val e2 = intercept[IllegalArgumentException] {
      ArrowSource(dir).load(spark).count()
    }
    assert(e2.getMessage.contains("no data files"))
  }

  test("FsSeekableChannel honors the channel contract after close()") {
    // r15 ADVICE: read()/position() kept serving data after close(),
    // and the channel leaked if reader construction threw before the
    // try/finally. The closed-channel half is pinned here; the leak
    // half is structural (ch closed in the outer finally of
    // sniffSchema whenever the reader didn't take ownership).
    val dir = tmpDir("arrow_chan")
    val f = new java.io.File(dir, "x.bin")
    java.nio.file.Files.write(f.toPath, Array.fill(16)(7.toByte))
    val hp = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ch = new graft.sources.FsSeekableChannel(fs.open(hp), 16L)
    val buf = java.nio.ByteBuffer.allocate(8)
    assert(ch.read(buf) == 8 && ch.position() == 8L && ch.isOpen)
    ch.close()
    assert(!ch.isOpen)
    intercept[java.nio.channels.ClosedChannelException] { ch.read(buf) }
    intercept[java.nio.channels.ClosedChannelException] { ch.position() }
    intercept[java.nio.channels.ClosedChannelException] { ch.position(0L) }
  }
}
