package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.AvroIO

/** Contract tests for the connector-free Avro source/sink: value
  * fidelity across the whole supported type surface (including nulls
  * and microsecond timestamps), multi-partition file layout, and
  * schema mapping. The oracle-facing end-to-end check is
  * `q63_avro_roundtrip` (events through Avro vs DuckDB over the
  * original parquet); these pin the pieces that query cannot isolate.
  */
class AvroIOSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n", IntegerType, nullable = true),
    StructField("x", DoubleType, nullable = true),
    StructField("flag", BooleanType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("b", BinaryType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))

  private def fixtureRows: Seq[Row] = {
    val t = Timestamp.valueOf("2026-03-01 12:34:56.123456") // true micros
    Seq(
      Row(1L, 42, 3.5, true, "plain", Array[Byte](1, 2, 3), t),
      Row(2L, null, null, null, null, null, null),
      Row(3L, -7, -0.25, false, "quote\"comma, and é", Array[Byte](), t),
      Row(4L, 0, Double.MaxValue, true, "", Array[Byte](-1, 0, 127),
        Timestamp.valueOf("1999-12-31 23:59:59.999999")))
  }

  test("roundtrip preserves every supported type, nulls included") {
    val dir = graft.core.TempDirs.create("avro_rt") + "/t1"
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(fixtureRows, 2), schema)
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir, schema)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"schema drift: ${back.schema}")
    val got = back.collect().map(r =>
      (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4),
        Option(r.get(5)).map(_.asInstanceOf[Array[Byte]].toSeq).orNull,
        r.get(6))).toSet
    val want = fixtureRows.map(r =>
      (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4),
        Option(r.get(5)).map(_.asInstanceOf[Array[Byte]].toSeq).orNull,
        r.get(6))).toSet
    assert(got === want)
  }

  test("date and decimal logical types round-trip exactly, pre-1970 and nulls included") {
    val dir = graft.core.TempDirs.create("avro_rt") + "/t_dd"
    val ddSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType, nullable = true),
      StructField("money", DecimalType(12, 2), nullable = true),
      StructField("tiny", DecimalType(4, 3), nullable = true)))
    def dec(s: String) = new java.math.BigDecimal(s)
    val rows = Seq(
      Row(1L, java.sql.Date.valueOf("2026-03-01"), dec("12345.67"), dec("0.001")),
      // pre-1970: negative epoch days; negative unscaled decimal bytes
      Row(2L, java.sql.Date.valueOf("1969-12-31"), dec("-0.01"), dec("-9.999")),
      Row(3L, java.sql.Date.valueOf("1900-02-28"), dec("9999999999.99"), dec("0.000")),
      Row(4L, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ddSchema)
    AvroIO.write(df, dir)
    // the writer schema carries the logical types (spec: scale/precision
    // travel in the schema)
    val ws = AvroIO.avroSchemaFor(ddSchema).toString
    assert(ws.contains("\"logicalType\":\"date\""), ws)
    assert(ws.contains("\"logicalType\":\"decimal\"") &&
      ws.contains("\"precision\":12") && ws.contains("\"scale\":2"), ws)
    val back = AvroIO.read(spark, dir, ddSchema)
    assert(back.schema("money").dataType === DecimalType(12, 2))
    val got = back.collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3))).toSet
    val want = rows.map(r => (r.getLong(0), r.get(1),
      Option(r.get(2)).map(_.asInstanceOf[java.math.BigDecimal].setScale(2)).orNull,
      Option(r.get(3)).map(_.asInstanceOf[java.math.BigDecimal].setScale(3)).orNull)).toSet
    assert(got === want, s"got $got")
  }

  test("timestamps survive at exact microsecond precision") {
    val dir = graft.core.TempDirs.create("avro_rt") + "/t2"
    val t = Timestamp.valueOf("2026-03-01 12:34:56.123456")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, null, null, null, null, null, t)), 1), schema)
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir, schema).collect()(0)
      .getAs[Timestamp]("ts")
    assert(back.getTime === t.getTime && back.getNanos === t.getNanos,
      s"micros lost: wrote $t read $back")
  }

  test("one container file per non-empty partition; read sees them all") {
    val dir = graft.core.TempDirs.create("avro_rt") + "/t3"
    val rows = (0L until 100L).map(i =>
      Row(i, i.toInt, i / 2.0, i % 2 == 0, s"s$i", Array[Byte](i.toByte),
        new Timestamp(1700000000000L + i)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    AvroIO.write(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length === 4, files.mkString(", "))
    val back = AvroIO.read(spark, dir, schema)
    // one input split per (tiny) file — scan parallelism tracks layout,
    // and at real file sizes the sync-marker splitter subdivides further
    assert(back.rdd.getNumPartitions >= 4)
    assert(back.count() === 100)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).collect()(0)
      .getLong(0) === (0L until 100L).sum)
  }

  test("write replaces prior content (overwrite semantics)") {
    val dir = graft.core.TempDirs.create("avro_rt") + "/t4"
    val mk = (n: Int) => spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until n).map(i => Row(i.toLong, null, null, null, null, null, null)), 2),
      schema)
    AvroIO.write(mk(50), dir)
    AvroIO.write(mk(7), dir)
    assert(AvroIO.read(spark, dir, schema).count() === 7)
  }

  test("an all-empty frame stays a readable layout (schema-only container)") {
    val dir = graft.core.TempDirs.create("avro_rt") + "/t6"
    val empty = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row], 2), schema)
    AvroIO.write(empty, dir)
    assert(AvroIO.read(spark, dir, schema).count() === 0)
  }

  test("schema resolution: a reader field missing from the writer fills its null default") {
    val dir = graft.core.TempDirs.create("avro_rt") + "/t5"
    val writerSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "a"), Row(2L, null)), 1),
      writerSchema)
    AvroIO.write(df, dir)
    // reader adds `extra` IN THE MIDDLE: resolution matches by NAME,
    // and the datum deserializes into the reader schema's positions
    val readerSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("extra", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true)))
    val got = AvroIO.read(spark, dir, readerSchema).collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2))).toSet
    assert(got === Set((1L, null, "a"), (2L, null, null)))
  }

  test("column projection: pruned read returns exactly the full read's projection") {
    val dir = graft.core.TempDirs.create("avro_rt") + "/t7"
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(fixtureRows, 2), schema)
    AvroIO.write(df, dir)
    // prune to a non-prefix, reordered subset: resolution is by NAME,
    // so the projected frame must carry the requested order and the
    // full read's values, with writer-only fields decoder-skipped
    val cols = Seq("ts", "id", "s")
    val pruned = AvroIO.read(spark, dir, schema, cols)
    assert(pruned.schema.fieldNames.toSeq === cols)
    val got = pruned.collect().map(r => (r.get(1), r.get(0), r.get(2))).toSet
    val want = AvroIO.read(spark, dir, schema)
      .selectExpr("id", "ts", "s").collect()
      .map(r => (r.get(0), r.get(1), r.get(2))).toSet
    assert(got === want)
    // a column outside the full schema fails loudly, not at decode time
    val err = intercept[IllegalArgumentException] {
      AvroIO.read(spark, dir, schema, Seq("id", "nope"))
    }
    assert(err.getMessage.contains("nope"))
  }

  test("no temp files survive a committed write") {
    val dir = graft.core.TempDirs.create("avro_rt") + "/t8"
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(fixtureRows, 3), schema)
    AvroIO.write(df, dir)
    // local fs adds .crc checksum sidecars (renamed with their file);
    // what must NOT survive is any attempt-temp container
    val names = new java.io.File(dir).listFiles().map(_.getName).toSeq
      .filterNot(_.endsWith(".crc"))
    assert(names.nonEmpty && names.forall(n =>
      n.matches("part-\\d{5}\\.avro")), s"unexpected files: $names")
  }

  private val complexSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("emb", ArrayType(FloatType, containsNull = true),
      nullable = true),
    StructField("tags", ArrayType(StringType, containsNull = false),
      nullable = true),
    StructField("props", MapType(StringType, LongType,
      valueContainsNull = true), nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n", IntegerType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("inner", StructType(Seq(
        StructField("deep", StringType, nullable = true))),
        nullable = true))), nullable = true)))

  private def complexRows: Seq[Row] = {
    val t = Timestamp.valueOf("2026-03-01 12:34:56.123456")
    Seq(
      Row(1L, Seq(1.5f, -2.25f, 0f), Seq("a", "b"),
        Map("k1" -> 10L, "k2" -> -3L), Row(7, t, Row("bottom"))),
      // nulls at every level: null element, null map value, null
      // nested-struct field, null inner struct
      Row(2L, Seq(0.5f, null, 3f), Seq.empty[String],
        Map("k" -> null), Row(null, null, null)),
      // null composites themselves
      Row(3L, null, null, null, null))
  }

  test("complex types round-trip: arrays, maps, nested structs, nulls at every level") {
    val dir = graft.core.TempDirs.create("avro_rt") + "/t9"
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(complexRows, 2), complexSchema)
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir, complexSchema)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      complexSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"schema drift: ${back.schema}")
    def norm(r: Row) = (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4))
    assert(back.collect().map(norm).toSet === spark.createDataFrame(
      spark.sparkContext.parallelize(complexRows, 2), complexSchema)
      .collect().map(norm).toSet)
  }

  test("schema evolution with a nested field: old writers null-fill the new composite") {
    val dir = graft.core.TempDirs.create("avro_rt") + "/t10"
    val writerSchema = StructType(Seq(
      StructField("id", LongType, nullable = false)))
    AvroIO.write(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L), Row(2L)), 1),
      writerSchema), dir)
    // the reader adds an array AND a nested struct the writer never had
    val readerSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("emb", ArrayType(FloatType), nullable = true),
      StructField("meta", StructType(Seq(
        StructField("n", IntegerType, nullable = true))), nullable = true)))
    val got = AvroIO.read(spark, dir, readerSchema).collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2))).toSet
    assert(got === Set((1L, null, null), (2L, null, null)))
  }

  test("non-string map keys fail loudly at schema mapping, not at write time") {
    val bad = StructType(Seq(
      StructField("m", MapType(LongType, StringType), nullable = true)))
    val err = intercept[IllegalArgumentException] {
      AvroIO.avroSchemaFor(bad)
    }
    assert(err.getMessage.contains("string-keyed"))
  }

  test("codecs: deflate and snappy round-trip identically and compress; bad name fails loud") {
    val base = graft.core.TempDirs.create("avro_rt")
    val rows = (0L until 400L).map(i =>
      Row(i, i.toInt, i / 2.0, i % 2 == 0,
        s"repetitive payload repetitive payload $i",
        Array[Byte](i.toByte), new Timestamp(1700000000000L + i)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    def bytes(dir: String): Long = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).map(_.length).sum
    def idSum(dir: String): Long = AvroIO.read(spark, dir, schema)
      .agg(org.apache.spark.sql.functions.sum("id")).collect()(0).getLong(0)
    AvroIO.write(df, s"$base/plain")
    for (codec <- Seq("deflate", "snappy")) {
      AvroIO.write(df, s"$base/$codec", codec)
      // readers auto-detect the codec from block metadata — same read
      // path, same values
      assert(idSum(s"$base/$codec") === idSum(s"$base/plain"), codec)
      assert(AvroIO.read(spark, s"$base/$codec", schema).count() === 400, codec)
    }
    assert(bytes(s"$base/deflate") < bytes(s"$base/plain"),
      "deflate must shrink the repetitive payload")
    val err = intercept[IllegalArgumentException] {
      AvroIO.write(df, s"$base/bad", "zstd9000")
    }
    assert(err.getMessage.contains("zstd9000"))
  }

  test("schema mapping: nullable fields become union(null, T), micros logical type") {
    val av = AvroIO.avroSchemaFor(schema)
    import org.apache.avro.Schema
    assert(av.getField("id").schema().getType === Schema.Type.LONG) // non-null
    val nSch = av.getField("n").schema()
    assert(nSch.getType === Schema.Type.UNION &&
      nSch.getTypes.get(0).getType === Schema.Type.NULL)
    val tsSch = av.getField("ts").schema().getTypes.get(1)
    assert(tsSch.getLogicalType != null &&
      tsSch.getLogicalType.getName === "timestamp-micros")
  }
}
