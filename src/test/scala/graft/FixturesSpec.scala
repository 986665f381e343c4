package graft

import java.io.{ByteArrayInputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import graft.pointcloud.las.LasHeader
import graft.pointcloud.ply.PlyHeader
import graft.pointcloud.syntax
import graft.pointcloud.syntax._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FIXTURES.md golden values + property tests:
  * §1 format record lengths, §2 golden header corpus (synthetic, no
  * network), §3 PLY reject fixtures, §4 XYZ user schema, PC-05 pid
  * stability under small splits, PC-06 nodata→null.
  */
class FixturesSpec extends SparkTestBase {
  import spark.implicits._

  test("LAS record lengths per format match FIXTURES.md §1") {
    val expected = Seq(20, 28, 26, 34, 57, 63, 30, 36, 38, 59, 67)
    assert((0 to 10).map(f => LasHeader.recordLength(f.toByte)) == expected)
  }

  test("LAS golden header corpus round-trips through the codec") {
    // (major, minor, fmt, vlr_nb, pdr_length, pdr_nb) per LasSuite.scala:33-45
    val golden = Seq(
      (1, 4, 7, 3, 40, 94451L), (1, 4, 8, 1, 40, 451351L),
      (1, 4, 6, 3, 36, 26202L), (1, 4, 7, 0, 36, 20L),
      (1, 4, 6, 3, 36, 99756L), (1, 4, 7, 2, 36, 22600L),
      (1, 0, 0, 5, 20, 11781L), (1, 2, 0, 0, 20, 497536L),
      (1, 0, 0, 5, 20, 11781L), (1, 1, 0, 0, 20, 11781L),
      (1, 0, 1, 3, 28, 10L))
    golden.foreach { case (major, minor, fmt, vlrNb, pdrLen, pdrNb) =>
      val h = LasHeader("golden.las", fmt.toByte, pdrCount = pdrNb,
        versionMajor = major.toByte, versionMinor = minor.toByte,
        vlrCount = vlrNb, pdrLengthRaw = pdrLen.toShort)
      val bos = new java.io.ByteArrayOutputStream()
      h.write(new DataOutputStream(bos))
      val bytes = bos.toByteArray
      assert(bytes.length == LasHeader.headerSize(minor.toByte).toInt)
      val back = LasHeader.read("golden.las", new ByteArrayInputStream(bytes))
      assert(back.versionMajor == major && back.versionMinor == minor)
      assert(back.pdrFormat == fmt && back.vlrCount == vlrNb)
      assert(back.pdrLength == pdrLen && back.pdrCount == pdrNb)
      // LasSuite.scala:114 invariant on a fresh header
      assert(back.returnCounts.sum == pdrNb || back.returnCounts.sum == 0)
    }
  }

  test("LAS header parse against an independently hand-rolled layout") {
    // layout per the public LAS 1.2 spec, constructed field-by-field
    val b = ByteBuffer.allocate(227).order(ByteOrder.LITTLE_ENDIAN)
    b.put("LASF".getBytes("US-ASCII"))
    b.putShort(4, 7)            // source id
    b.put(24, 1.toByte); b.put(25, 2.toByte) // version 1.2
    b.putShort(94, 227)         // header size
    b.putInt(96, 227)           // pdr offset
    b.putInt(100, 0)            // vlr count
    b.put(104, 0.toByte)        // format 0
    b.putShort(105, 20)         // record length
    b.putInt(107, 1234)         // legacy count
    b.putDouble(131, 0.01); b.putDouble(139, 0.02); b.putDouble(147, 0.03) // scale
    b.putDouble(155, 10.0); b.putDouble(163, 20.0); b.putDouble(171, 30.0) // offset
    b.putDouble(179, 99.5)      // max x
    b.putDouble(187, -1.5)      // min x
    val h = LasHeader.read("hand.las", new ByteArrayInputStream(b.array()))
    assert(h.sourceId == 7 && h.versionMinor == 2 && h.pdrFormat == 0)
    assert(h.pdrCount == 1234 && h.pdrLength == 20)
    assert(h.scale.toSeq == Seq(0.01, 0.02, 0.03) && h.offset.toSeq == Seq(10.0, 20.0, 30.0))
    assert(h.pMax(0) == 99.5 && h.pMin(0) == -1.5)
  }

  test("PLY reject fixtures: ascii format, list property, truncated header") {
    def parse(s: String) = PlyHeader.read("bad.ply", new ByteArrayInputStream(s.getBytes))
    intercept[IllegalArgumentException](parse("ply\nformat ascii 1.0\nend_header\n"))
    intercept[IllegalArgumentException](parse(
      "ply\nformat binary_little_endian 1.0\nelement face 1\nproperty list uchar int vertex_index\nend_header\n"))
    intercept[IllegalArgumentException](parse("notaply\nend_header\n"))
    // truncated header (EOF before end_header) must throw, not spin
    intercept[java.io.EOFException](parse(
      "ply\nformat binary_little_endian 1.0\nelement vertex 3\n"))
    intercept[java.io.EOFException](parse(
      "ply\nformat binary_little_endian 1.0\nelement vertex 3"))
  }

  test("PLY golden header text matches the reference shape") {
    val h = PlyHeader("t.ply", littleEndian = true, 0, Seq(
      graft.pointcloud.ply.PlyElement("vertex", 5995, StructType(Seq(
        StructField("x", FloatType), StructField("y", FloatType),
        StructField("z", FloatType))))))
    assert(h.headerText ==
      "ply\nformat binary_little_endian 1.0\nelement vertex 5995\n" +
      "property float x\nproperty float y\nproperty float z\nend_header\n")
  }

  test("PC-05: pid stable under many small partitions") {
    val dir = Files.createTempDirectory("graft-pid").toString
    spark.range(5000).select(
      col("id").cast("int").as("x"), col("id").cast("int").as("y"),
      lit(0).as("z").cast("int"), lit(0).cast("short").as("intensity"),
      lit(1).cast("byte").as("flags"), lit(0).cast("byte").as("classification"),
      lit(0).cast("byte").as("angle"), lit(0).cast("byte").as("user"),
      lit(0).cast("short").as("source"))
      .coalesce(1).writeLas(dir)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      val back = spark.read.las(dir)
      assert(back.rdd.getNumPartitions > 5)
      // pid must be the record index: x was written = row id = pid
      assert(back.where($"x" =!= $"pid").count() == 0)
      assert(back.select("pid").distinct().count() == 5000)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("PC-06: nodata sentinel becomes null end-to-end") {
    val dir = Files.createTempDirectory("graft-nodata").toString
    val md = new MetadataBuilder().putLong("nodata", -999L).build()
    val df = spark.range(100).select(
      col("id").cast("int").as("x"), lit(0).cast("int").as("y"),
      lit(0).cast("int").as("z"), lit(0).cast("short").as("intensity"),
      lit(1).cast("byte").as("flags"), lit(0).cast("byte").as("classification"),
      lit(0).cast("byte").as("angle"), lit(0).cast("byte").as("user"),
      lit(0).cast("short").as("source"),
      when(col("id") % 10 === 0, lit(-999)).otherwise(col("id")).cast("int")
        .as("quality", md))
    df.writeLas(dir)
    val back = spark.read.las(dir)
    assert(back.schema("quality").nullable)
    assert(back.where($"quality".isNull).count() == 10)
    assert(back.where($"quality" === -999).count() == 0)
  }

  test("withCoordinates reconstructs world coordinates from metadata") {
    val dir = Files.createTempDirectory("graft-coords").toString
    spark.range(100).select(
      col("id").cast("int").as("x"), col("id").cast("int").as("y"),
      col("id").cast("int").as("z"), lit(0).cast("short").as("intensity"),
      lit(1).cast("byte").as("flags"), lit(0).cast("byte").as("classification"),
      lit(0).cast("byte").as("angle"), lit(0).cast("byte").as("user"),
      lit(0).cast("short").as("source"))
      .writeLas(dir, Map("scale" -> "0.01", "offset" -> "100"))
    val back = syntax.withCoordinates(spark.read.las(dir))
    assert(back.columns.contains("x_d"))
    val bad = back.where(abs($"x_d" - ($"x" * 0.01 + 100.0)) > 1e-9).count()
    assert(bad == 0)
  }

  test("XYZ honors a user-supplied schema for token positions") {
    val dir = Files.createTempDirectory("graft-xyzschema").toString
    Files.writeString(java.nio.file.Paths.get(dir, "pts.xyz"), "1.5\t2.5\t3.5\n-0.25\t4.0\t2.25\n")
    val schema = StructType(Seq(
      StructField("fid", IntegerType, nullable = false),
      StructField("pid", LongType, nullable = false),
      StructField("x", DoubleType), StructField("y", DoubleType),
      StructField("z", DoubleType)))
    val df = spark.read.schema(schema).xyz(dir + "/pts.xyz")
    assert(df.columns.toSeq == Seq("fid", "pid", "x", "y", "z"))
    assert(df.agg(sum("x")).as[Double].head() == 1.25)
  }

  test("property: random numeric frames round-trip through PLY") {
    val types = Seq[DataType](ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 8) {
      val ts = List.fill(1 + rnd.nextInt(6))(types(rnd.nextInt(types.size)))
      val n = 1 + rnd.nextInt(200)
      val fields = ts.zipWithIndex.map { case (t, i) => StructField(s"c$i", t, nullable = false) }
      val rows = (0 until n).map { r =>
        org.apache.spark.sql.Row.fromSeq(fields.map { f =>
          val v = r * 31 + f.name.hashCode % 97
          f.dataType match {
            case ByteType => v.toByte
            case ShortType => v.toShort
            case IntegerType => v
            case LongType => v.toLong
            case FloatType => v.toFloat
            case DoubleType => v.toDouble
          }
        })
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), StructType(fields))
      val dir = Files.createTempDirectory("graft-prop").toString
      df.writePly(dir)
      val back = spark.read.ply(dir).drop("fid", "pid")
      assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        fields.map(f => (f.name, f.dataType)))
      val key = fields.map(f => org.apache.spark.sql.functions.col(f.name))
      assert(back.orderBy(key: _*).collect().toSeq ==
        df.orderBy(key: _*).collect().toSeq)
    }
  }

  test("property: schema merge is commutative on types") {
    import graft.pointcloud.SchemaMerge
    val types = Seq[DataType](ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
    for (a <- types; b <- types) {
      val l = try Some(SchemaMerge.mergeType(a, b)) catch { case _: IllegalArgumentException => None }
      val r = try Some(SchemaMerge.mergeType(b, a)) catch { case _: IllegalArgumentException => None }
      assert(l == r, s"merge($a,$b) not commutative")
    }
  }

  test("events loader lands timestamps in the file's actual epoch") {
    // The events parquet's ts unit has flipped between TIMESTAMP(NANOS)
    // and TIMESTAMP(MICROS) across driver data generations. A wrong unit
    // is silent: every event lands decades off (micros read as nanos →
    // 1970) while all Spark-vs-Spark comparisons stay green. Pin that the
    // batch loader and the file stream agree with the footer-declared
    // unit: the generator writes modern dates, so a year before 2000
    // can only mean the conversion picked the wrong factor.
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType)
    val yr = ev.agg(min(year(col("ts"))), max(year(col("ts"))))
      .collect()(0)
    assert(yr.getInt(0) >= 2000 && yr.getInt(1) <= 2200,
      s"events ts outside a plausible epoch: $yr — ts-unit sniff broken?")
    // stream side shares the conversion — but a wrong-factor bug applied
    // stream-side only would pass a schema check, so actually run one
    // micro-batch and assert the streamed VALUES land in the same epoch.
    val stream = graft.streaming.EventStreams.readEventStream(spark, sfDir)
    assert(stream.schema("ts").dataType == TimestampType)
    val sinkName = "ts_epoch_check"
    val q = stream.agg(min(year(col("ts"))).as("y0"), max(year(col("ts"))).as("y1"))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val sy = spark.table(sinkName).collect()(0)
    assert(sy.getInt(0) >= 2000 && sy.getInt(1) <= 2200,
      s"streamed events ts outside a plausible epoch: $sy — stream-side conversion broken?")
  }

  test("legacy TIMESTAMP(NANOS) events layout selects the div-1000 path") {
    // a committed pyarrow-written fixture in the r08-era NANOS layout:
    // 20 events, one per minute from 2024-01-01T00:00Z, ts stored as
    // INT64 TIMESTAMP(nanos). This is the regression the ts-unit sniff
    // exists for — if the guarded error condition ever drifts from what
    // Spark actually throws for NANOS inference, THIS test fails with
    // the real condition in the propagated exception instead of the
    // suite staying silently green on a dead guard.
    val dir = getClass.getResource("/events-nanos").getPath
    assert(!Tables.eventsTsIsMicros(spark, dir), "NANOS layout classified as micros")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    val r = ev.agg(count(lit(1)), min(col("ts")).cast("string"),
      max(col("ts")).cast("string")).collect()(0)
    assert(r.getLong(0) == 20L)
    assert(r.getString(1) == "2024-01-01 00:00:00", r.getString(1))
    assert(r.getString(2) == "2024-01-01 00:19:00", r.getString(2))
  }
}
