package graft

import graft.sinks.CsvSink
import graft.sources.{CsvSource, LineSource}
import java.nio.file.{Files, Paths}

/** CSV/line quirk coverage per FIXTURES.md §A.2 (fixtures regenerated
  * here to the reference spec — unicode, embedded newlines, quotes,
  * BOM, `sep=` prolog; reference `tests/FileTest.php:29-45,136-190`). */
class FileFormatsSpec extends SparkSuite {

  private val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
  private def write(path: String, content: String, withBom: Boolean = false): Unit = {
    val out = Files.newOutputStream(Paths.get(path))
    if (withBom) out.write(bom)
    out.write(content.getBytes("UTF-8"))
    out.close()
  }

  private val headerCsv =
    "id,name,given_name,city,garbage\n" +
    "1,Doe,约翰,\"San\nCelestio\",\"a\"\"6\\nA'R`à1,;h\"\n" +
    "2,Smith,夏洛特,Paris,plain\n"

  test("CSV with header, unicode, embedded newline, quotes") {
    val dir = tmpDir("csv_basic")
    write(s"$dir/data_header.csv", headerCsv)
    val df = CsvSource(s"$dir/data_header.csv", escape = "\"").load(spark)
    assert(df.columns.toSeq == Seq("id", "name", "given_name", "city", "garbage"))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(2) == "约翰")
    assert(rows(0).getString(3) == "San\nCelestio")
    assert(rows(0).getString(4) == "a\"6\\nA'R`à1,;h")
  }

  test("CSV malformed rows: PERMISSIVE null-fill, no job failure (bad-record tolerance)") {
    // a short row (missing column) and a long row (extra column) must
    // not abort a 100 TB ingest; PERMISSIVE parses what it can —
    // missing fields null-filled, extras dropped — and good rows are
    // untouched
    val dir = tmpDir("csv_malformed")
    write(s"$dir/bad.csv", "id,name,val\n1,alice,10\n2,bob\n3,carol,30,EXTRA\n4,dan,40\n")
    val df = CsvSource(s"$dir/bad.csv").load(spark)
    assert(df.count() == 4) // every row surfaced
    val byId = df.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("2").isNullAt(2))            // short row null-filled
    assert(byId("3").getString(1) == "carol") // long row keeps known cols
    assert(byId("4").getString(2) == "40")    // good rows untouched
  }

  test("CSV with UTF-8 BOM: detected, first column name clean") {
    val dir = tmpDir("csv_bom")
    write(s"$dir/data_bom.csv", "id,name\n1,a\n2,b\n", withBom = true)
    val df = CsvSource(s"$dir/data_bom.csv").load(spark)
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.count() == 2)
  }

  test("CSV with Excel sep=; prolog: delimiter auto-detected, prolog dropped") {
    val dir = tmpDir("csv_sep")
    write(s"$dir/data_sep.csv", "sep=;\nid;name\n1;a\n2;b\n")
    val df = CsvSource(s"$dir/data_sep.csv").load(spark)
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.count() == 2)
    assert(df.orderBy("id").head().getString(1) == "a")
  }

  test("CSV sep= + BOM together") {
    val dir = tmpDir("csv_sep_bom")
    write(s"$dir/d.csv", "sep=;\nid;name\n1;x\n", withBom = true)
    val df = CsvSource(s"$dir/d.csv").load(spark)
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.head().getString(1) == "x")
  }

  test("CSV without header: positional columns") {
    val dir = tmpDir("csv_nohdr")
    write(s"$dir/d.csv", "1,a\n2,b\n")
    val df = CsvSource(s"$dir/d.csv", header = false).load(spark)
    assert(df.count() == 2)
    assert(df.columns.length == 2)
  }

  test("CSV round-trip: sink with BOM + sep= + header re-reads identically") {
    val dir = tmpDir("csv_rt")
    import spark.implicits._
    val in = Seq((1L, "a,b", "x\"y"), (2L, "über", "ok")).toDF("id", "v1", "v2")
    CsvSink(s"$dir/out.csv", header = true, sep = ";",
      writeBom = true, writeSepLine = true, singleFile = true).write(in)
    // prolog bytes present
    val bytes = Files.readAllBytes(Paths.get(s"$dir/out.csv"))
    assert(bytes.take(3).sameElements(bom))
    assert(new String(bytes.drop(3).take(6), "UTF-8") == "sep=;\n")
    val back = CsvSource(s"$dir/out.csv").load(spark)
      .selectExpr("cast(id as long) id", "v1", "v2")
    assert(back.orderBy("id").collect().toSeq == in.orderBy("id").collect().toSeq)
  }

  test("CSV round-trip distributed (multi-part, prolog per part)") {
    val dir = tmpDir("csv_rt_dist")
    import spark.implicits._
    val in = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(4)
    CsvSink(s"$dir/out", header = true, sep = ",", writeBom = true, writeSepLine = false).write(in)
    val back = CsvSource(s"$dir/out").load(spark).selectExpr("cast(id as long) id", "v")
    assert(back.count() == 100)
    assert(back.orderBy("id").collect().map(_.getString(1)).take(3).toSeq == Seq("v1", "v2", "v3"))
  }

  test("LineSource: trims, drops empty lines, BOM-aware (LineExtractor)") {
    val dir = tmpDir("lines")
    write(s"$dir/lines.txt", "1\n2\n\n  3  \n\n4\n", withBom = true)
    val vals = LineSource(s"$dir/lines.txt").load(spark)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(vals == Seq("1", "2", "3", "4"))
  }

  test("CSV round-trip in UTF-16LE: sink encodes + BOM, source BOM-detects") {
    // reference FileHandlerTrait.php:26-87 encoding handling: the sink
    // writes UTF-16LE with its BOM; the source must detect the BOM,
    // decode, and still auto-detect the sep= prolog in that encoding
    val dir = tmpDir("csv_utf16")
    import spark.implicits._
    val in = Seq((1L, "über", "约翰"), (2L, "plain", "ok")).toDF("id", "v1", "v2")
    CsvSink(s"$dir/out.csv", header = true, sep = ";", writeBom = true,
      writeSepLine = true, singleFile = true, encoding = "UTF-16LE").write(in)
    val bytes = Files.readAllBytes(Paths.get(s"$dir/out.csv"))
    assert(bytes.take(2).sameElements(Array(0xFF.toByte, 0xFE.toByte))) // UTF-16LE BOM
    assert(new String(bytes.drop(2).take(12), "UTF-16LE") == "sep=;\n")
    val back = CsvSource(s"$dir/out.csv").load(spark) // no encoding passed: BOM-detected
      .selectExpr("cast(id as long) id", "v1", "v2")
    assert(back.orderBy("id").collect().toSeq == in.orderBy("id").collect().toSeq)
  }

  test("LineSource reads UTF-16BE via BOM detection and explicit encoding") {
    val dir = tmpDir("lines_utf16")
    // with BOM: auto-detected
    val withBom = Files.newOutputStream(Paths.get(s"$dir/bom.txt"))
    withBom.write(Array(0xFE.toByte, 0xFF.toByte))
    withBom.write("héllo\n\n  wörld  \n".getBytes("UTF-16BE"))
    withBom.close()
    val auto = LineSource(s"$dir/bom.txt").load(spark)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(auto == Seq("héllo", "wörld"))
    // without BOM: explicit encoding parameter
    Files.write(Paths.get(s"$dir/plain.txt"), "a\nb\n".getBytes("UTF-16LE"))
    val explicit = LineSource(s"$dir/plain.txt", encoding = Some("UTF-16LE")).load(spark)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(explicit == Seq("a", "b"))
  }

  test("JSONL: explicit schema honored, malformed lines null-fill (PERMISSIVE), escaping round-trips") {
    import graft.sinks.JsonlSink
    import graft.sources.JsonlSource
    import org.apache.spark.sql.types._
    val dir = tmpDir("jsonl")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("txt", StringType)))
    // hand-written file with a malformed middle line and JSON escapes
    write(s"$dir/in.jsonl",
      """{"id": 1, "txt": "quote \" slash \\ tab \t"}
        |{this is not json
        |{"id": 3, "txt": "héllo\n微笑"}
        |""".stripMargin)
    val df = JsonlSource(s"$dir/in.jsonl", schema = Some(schema)).load(spark)
    assert(df.schema.fieldNames.toSeq == Seq("id", "txt"))
    val rows = df.collect()
    assert(rows.length == 3)                      // malformed line kept, null-filled
    assert(rows.count(_.isNullAt(0)) == 1)        // not a job failure
    val byId = rows.filter(!_.isNullAt(0)).map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(1L) == "quote \" slash \\ tab \t")
    assert(byId(3L) == "héllo\n微笑")
    // sink → source round-trip preserves content exactly (escaping incl.)
    import spark.implicits._
    val out = s"$dir/out"
    JsonlSink(out).write(byId.toSeq.toDF("id", "txt"))
    val back = JsonlSource(out, schema = Some(schema)).load(spark)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == byId)
  }

  test("XML: sink entity-escapes markup/quotes/unicode, source round-trips with explicit schema") {
    import graft.sinks.XmlSink
    import graft.sources.XmlSource
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = tmpDir("xml_rt")
    // markup characters, quotes, unicode, an embedded newline — every
    // one must survive the writer's entity escaping
    val rows = Seq(
      (1L, "a < b && c > d"),
      (2L, "quote \" apos ' amp & done"),
      (3L, "héllo\n微笑"))
    val out = s"$dir/out"
    XmlSink(out).write(rows.toDF("id", "txt"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("txt", StringType)))
    val back = XmlSource(out, schema = Some(schema)).load(spark)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == rows.toMap)
  }

  test("compact_files consolidates the staged small files to the sized target") {
    // run the driver query once, then audit the scratch directories it
    // leaves behind: 1000 events rolled at 500/file stage exactly 2
    // small files, and the metadata-sized rewrite (≪128 MiB → nOut=1)
    // must land exactly 1 — plus row-for-row preservation, which the
    // DuckDB gate re-checks cross-engine via the aggregate.
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.FileQueries.defs
      .find(_.name == "compact_files").get.fn(spark, dir)
    assert(out.count() == 5) // one row per event_type
    val key = dir.replaceAll("[^A-Za-z0-9]", "_")
    val scratchRoot = s"${System.getProperty("java.io.tmpdir")}/graft_fileq/$key"
    def parts(sub: String) = new java.io.File(s"$scratchRoot/$sub")
      .listFiles().toSeq.map(_.getName).filter(_.endsWith(".parquet"))
    assert(parts("compact_small").length == 2, "staging should roll 1000 rows into 2 files")
    assert(parts("compact_big").length == 1, "compaction should consolidate to the sized nOut=1")
    val rows = spark.read.parquet(s"$scratchRoot/compact_big").count()
    assert(rows == 1000L)
  }

  test("fixed-width: exact byte layout on disk, typed round-trip, blank-field NULL") {
    import graft.sinks.FixedWidthSink
    import graft.sources.FixedWidthSource
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val dir = tmpDir("fw_layout")
    val layout = Seq("id" -> 6, "name" -> 8, "bal" -> 10)
    val df = spark.createDataFrame(Seq(
      (7L, "ann", 12.5), (42L, "bo b", -0.25))).toDF("id", "name", "bal")
    FixedWidthSink(s"$dir/out", layout).write(df)
    // raw lines: every record exactly 24 chars, fields at fixed offsets
    val raw = spark.read.text(s"$dir/out").collect().map(_.getString(0)).sorted
    assert(raw.forall(_.length == 24), raw.mkString("|"))
    assert(raw(0) == "42    bo b    -0.25     ", s"[${raw(0)}]")
    assert(raw(1) == "7     ann     12.5      ", s"[${raw(1)}]")
    val back = FixedWidthSource(s"$dir/out", layout,
        types = Map("id" -> LongType, "bal" -> DoubleType)).load(spark)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(back == Set((7L, "ann", 12.5), (42L, "bo b", -0.25)))
    // a blank numeric field reads back as NULL (the format's documented
    // NULL/empty ambiguity, resolved to NULL by the cast)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/blank.txt"), "9         " + "\n")
    val b = FixedWidthSource(s"$dir/blank.txt", Seq("id" -> 6, "bal" -> 10),
      types = Map("id" -> LongType, "bal" -> DoubleType)).load(spark).collect()
    assert(b.head.getLong(0) == 9L && b.head.isNullAt(1))
  }

  test("fixed-width sink is loud on overflow, trailing space, and NULL") {
    import graft.sinks.FixedWidthSink
    val dir = tmpDir("fw_loud")
    def attempt(rows: Seq[(java.lang.Long, String)]): Throwable =
      intercept[Exception] {
        FixedWidthSink(s"$dir/bad", Seq("id" -> 4, "name" -> 6))
          .write(spark.createDataFrame(rows).toDF("id", "name"))
      }
    // value wider than the field would shift every later column
    assert(attempt(Seq((1L: java.lang.Long, "sevenchars"))).getMessage
      .contains("overflow"))
    // trailing space is indistinguishable from padding after the trip
    assert(attempt(Seq((1L: java.lang.Long, "ab "))).getMessage
      .contains("trailing space"))
    // NULL has no encoding distinct from the empty string
    assert(attempt(Seq((1L: java.lang.Long, null: String))).getMessage
      .contains("NULL"))
  }

  test("gzip CSV: .gz parts on disk, codec transparent on read, non-splittable bound") {
    import graft.sinks.CsvSink
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("csv_gz")
    val df = spark.range(0, 1000, 1, 4).toDF("id")
      .withColumn("label", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("row-"), col("id")))
    CsvSink(s"$dir/out", compression = Some("gzip")).write(df)
    val parts = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getName)
    assert(parts.nonEmpty && parts.forall(_.endsWith(".csv.gz")), parts.mkString(","))
    val back = CsvSource(s"$dir/out", multiLine = false).load(spark)
    assert(back.count() == 1000)
    assert(back.select(col("id").cast("long")).agg(
      org.apache.spark.sql.functions.sum("id")).head.getLong(0) == 499500L)
    // gzip cannot split: read tasks can never exceed the file count
    assert(back.rdd.getNumPartitions <= parts.length,
      s"${back.rdd.getNumPartitions} partitions from ${parts.length} gz files")
    // prolog machinery cannot combine with a codec (byte-rewrite paths)
    intercept[IllegalArgumentException] {
      CsvSink(s"$dir/bad", writeBom = true, compression = Some("gzip"))
    }
  }

  test("JdbcUpsertSink SQL builder (no DB in env — pure check)") {
    import graft.sinks.JdbcUpsertSink
    val pg = JdbcUpsertSink.upsertSql("postgresql", "t", Seq("id", "a", "b"), Seq("id"))
    assert(pg == "INSERT INTO t (id, a, b) VALUES (?, ?, ?) ON CONFLICT (id) DO UPDATE SET a = excluded.a, b = excluded.b")
    val my = JdbcUpsertSink.upsertSql("mysql", "t", Seq("id", "a"), Seq("id"))
    assert(my == "INSERT INTO t (id, a) VALUES (?, ?) ON DUPLICATE KEY UPDATE a = VALUES(a)")
  }
}
