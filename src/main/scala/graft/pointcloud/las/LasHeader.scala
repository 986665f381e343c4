package graft.pointcloud.las

import java.io.{DataOutputStream, EOFException, InputStream}
import java.nio.{ByteBuffer, ByteOrder}

import graft.pointcloud.Section
import org.apache.spark.sql.types._

/** ASPRS LAS 1.0–1.4 file header, point-data-record formats 0–10.
  *
  * Field layout follows the public LAS specification (also exercised by the
  * reference at las/LasHeader.scala:411-498): all values little-endian;
  * header sizes 227 (1.0–1.2), 235 (1.3), 375 (1.4); the bounding box is
  * stored interleaved max-then-min per axis starting at byte 179.
  *
  * Unsigned fields are mapped to signed Spark types of the same width,
  * matching the reference (las/LasHeader.scala:342-398) so raw binary
  * round-trips are exact; values above the signed max wrap negative.
  */
case class LasHeader(
    location: String,
    pdrFormat: Byte,
    pdrCount: Long = 0,
    pMin: Array[Double] = Array.fill(3)(0.0),
    pMax: Array[Double] = Array.fill(3)(0.0),
    scale: Array[Double] = Array.fill(3)(1.0),
    offset: Array[Double] = Array.fill(3)(0.0),
    returnCounts: Array[Long] = Array.fill(15)(0L),
    pdrOffsetRaw: Int = 0,
    versionMajor: Byte = 1,
    versionMinor: Byte = 2,
    systemId: String = "graft",
    software: String = "graft-pointcloud",
    sourceId: Short = 0,
    globalEncoding: Short = 0,
    vlrCount: Int = 0,
    pdrLengthRaw: Short = 0,
    creationDay: Short = 0,
    creationYear: Short = 0,
    waveformOffset: Long = 0,
    evlrOffset: Long = 0,
    evlrCount: Int = 0,
    extraFields: Array[StructField] = Array.empty,
    /** LAZ flag: the stored point-format byte had its high bit set
      * (LASzip convention for compressed point data). `pdrFormat` is
      * always the CLEAN format; the bit is re-applied on write. */
    compressed: Boolean = false) {

  def headerSize: Short = LasHeader.headerSize(versionMinor)
  def pdrOffset: Int = if (pdrOffsetRaw > 0) pdrOffsetRaw else headerSize.toInt
  /** Declared record length may exceed the format's base fields (extra
    * bytes at the record tail). */
  def pdrLength: Short =
    math.max(pdrLengthRaw.toInt, LasHeader.recordLength(pdrFormat)).toShort

  /** Full per-point schema: the format's base fields + any extra-bytes
    * fields described by VLRs (or opaque pad bytes). */
  def schema: StructType = StructType(LasHeader.schema(pdrFormat).fields ++ extraFields)

  def toSection: Section =
    Section(location, pdrOffset.toLong, pdrCount, littleEndian = true, schema, pdrLength.toInt)

  /** Serialize; emits exactly `headerSize` bytes. Legacy (32-bit) count
    * slots get 0 when the true count overflows Int, per LAS 1.4. */
  def write(dos: DataOutputStream): Unit = {
    val bytes = new Array[Byte](headerSize.toInt)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def legacy(x: Long): Int = if (x > Int.MaxValue) 0 else x.toInt
    def putString(s: String, len: Int): Unit = {
      val b = s.getBytes("US-ASCII").take(len).padTo(len, 0.toByte)
      buf.put(b)
    }
    buf.put("LASF".getBytes("US-ASCII"))
    buf.putShort(sourceId)
    buf.putShort(globalEncoding)
    buf.position(24) // project GUID left zero
    buf.put(versionMajor).put(versionMinor)
    putString(systemId, 32)
    putString(software, 32)
    buf.putShort(creationDay).putShort(creationYear)
    buf.putShort(headerSize)
    buf.putInt(pdrOffset)
    buf.putInt(vlrCount)
    buf.put((if (compressed) pdrFormat | 0x80 else pdrFormat.toInt).toByte)
    buf.putShort(pdrLength)
    buf.putInt(legacy(pdrCount))
    var i = 0
    while (i < 5) { buf.putInt(legacy(returnCounts(i))); i += 1 }
    scale.foreach(buf.putDouble)
    offset.foreach(buf.putDouble)
    // interleaved max-then-min per axis (bytes 179..226)
    i = 0
    while (i < 3) { buf.putDouble(pMax(i)); buf.putDouble(pMin(i)); i += 1 }
    if (versionMinor >= 3) buf.putLong(waveformOffset)
    if (versionMinor >= 4) {
      buf.putLong(evlrOffset)
      buf.putInt(evlrCount)
      buf.putLong(pdrCount)
      returnCounts.take(15).foreach(buf.putLong)
    }
    dos.write(bytes)
  }
}

object LasHeader {

  def headerSize(minor: Byte): Short = minor match {
    case 0 | 1 | 2 => 227
    case 3         => 235
    case _         => 375
  }

  /** Fields that the LAS spec stores unsigned (mapped to signed Spark
    * types of the same width by default; `option("widenUnsigned","true")`
    * widens and zero-extends them instead — SURVEY §7.5). x/y/z and the
    * scan angles are signed in the spec; GPS time is f64. */
  private val unsignedFields: Set[String] = Set(
    "intensity", "return", "flags", "classification", "user", "source",
    "red", "green", "blue", "nir", "index", "size")

  /** Per-point base schemas for point-data-record formats 0–10 (public LAS
    * spec; field names follow the reference, las/LasHeader.scala:342-398,
    * so queries written against it keep working). */
  val schema: Array[StructType] = {
    def st(fields: (String, DataType)*): Array[(String, DataType)] = fields.toArray
    val xyzI = st("x" -> IntegerType, "y" -> IntegerType, "z" -> IntegerType,
      "intensity" -> ShortType)
    val rgb = st("red" -> ShortType, "green" -> ShortType, "blue" -> ShortType)
    val waveform = st("index" -> ByteType, "offset" -> LongType, "size" -> IntegerType,
      "location" -> FloatType, "xt" -> FloatType, "yt" -> FloatType, "zt" -> FloatType)

    val f = new Array[Array[(String, DataType)]](11)
    f(0) = xyzI ++ st("flags" -> ByteType, "classification" -> ByteType,
      "angle" -> ByteType, "user" -> ByteType, "source" -> ShortType)
    f(1) = f(0) ++ st("time" -> DoubleType)
    f(2) = f(0) ++ rgb
    f(3) = f(1) ++ rgb
    f(4) = f(1) ++ waveform
    f(5) = f(3) ++ waveform
    // 1.4 extended formats: wider return/angle fields, time always present
    f(6) = xyzI ++ st("return" -> ByteType, "flags" -> ByteType,
      "classification" -> ByteType, "user" -> ByteType, "angle" -> ShortType,
      "source" -> ShortType, "time" -> DoubleType)
    f(7) = f(6) ++ rgb
    f(8) = f(7) ++ st("nir" -> ShortType)
    f(9) = f(6) ++ waveform
    f(10) = f(8) ++ waveform
    val unsignedMeta = new MetadataBuilder().putBoolean("unsigned", true).build()
    f.map(fields => StructType(fields.map { case (n, t) =>
      StructField(n, t, nullable = false,
        if (unsignedFields(n)) unsignedMeta else Metadata.empty)
    }))
  }

  def recordLength(format: Byte): Int =
    schema(format.toInt).fields.map(f => graft.pointcloud.PointCloudTypes.sizeOf(f.dataType)).sum

  /** Smallest format whose field set covers `s` (minus fid/pid), for
    * format inference on write (reference: las/LasHeader.scala:400-409). */
  def formatFromSchema(s: StructType, fidCol: String = "fid", pidCol: String = "pid"): Byte = {
    val wanted = s.fields
      .filterNot(f => f.name == fidCol || f.name == pidCol)
      .map(f => (f.name, f.dataType)).toSet
    val idx = schema.indexWhere { fmt =>
      val have = fmt.fields.map(f => (f.name, f.dataType)).toSet
      wanted.subsetOf(have)
    }
    require(idx >= 0, s"schema is not a subset of any LAS point format: $s")
    idx.toByte
  }

  /** Parse a header from a stream positioned at byte 0. Reads only the
    * declared header bytes (so files with zero points parse too). */
  def read(location: String, in: InputStream): LasHeader = {
    def readFully(n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      var got = 0
      while (got < n) {
        val r = in.read(b, got, n - got)
        if (r < 0) throw new EOFException(s"$location: truncated LAS header")
        got += r
      }
      b
    }
    val base = readFully(227)
    val buf = ByteBuffer.wrap(base).order(ByteOrder.LITTLE_ENDIAN)
    val sig = new String(base, 0, 4, "US-ASCII")
    require(sig == "LASF", s"$location: not a LAS file (signature=$sig)")

    def str(off: Int, len: Int): String = {
      val b = base.slice(off, off + len).takeWhile(_ != 0)
      new String(b.map(_.toChar))
    }

    val versionMajor = buf.get(24)
    val versionMinor = buf.get(25)
    val vlrCount = buf.getInt(100)
    val pdrFormatRaw = buf.get(104) & 0xff
    val pdrFormat = (pdrFormatRaw & 0x3f).toByte // mask off LAZ compression bits
    val compressed = (pdrFormatRaw & 0x80) != 0 // LASzip-compressed point data
    val pdrLengthRaw = buf.getShort(105)
    var pdrCount: Long = buf.getInt(107).toLong & 0xffffffffL
    val returnCounts = new Array[Long](15)
    var i = 0
    while (i < 5) { returnCounts(i) = buf.getInt(111 + 4 * i).toLong & 0xffffffffL; i += 1 }
    val scale = Array.tabulate(3)(i => buf.getDouble(131 + 8 * i))
    val offset = Array.tabulate(3)(i => buf.getDouble(155 + 8 * i))
    val pMax = Array.tabulate(3)(i => buf.getDouble(179 + 16 * i))
    val pMin = Array.tabulate(3)(i => buf.getDouble(187 + 16 * i))

    var waveformOffset = 0L
    var evlrOffset = 0L
    var evlrCount = 0
    if (versionMinor >= 3) {
      val ext = ByteBuffer.wrap(readFully(8)).order(ByteOrder.LITTLE_ENDIAN)
      waveformOffset = ext.getLong(0)
    }
    if (versionMinor >= 4) {
      val ext = ByteBuffer.wrap(readFully(140)).order(ByteOrder.LITTLE_ENDIAN)
      evlrOffset = ext.getLong(0)
      evlrCount = ext.getInt(8)
      val count64 = ext.getLong(12)
      if (count64 > 0) pdrCount = count64
      i = 0
      while (i < 15) {
        val c = ext.getLong(20 + 8 * i)
        if (c > 0) returnCounts(i) = c
        i += 1
      }
    }

    LasHeader(
      location = location,
      pdrFormat = pdrFormat,
      pdrCount = pdrCount,
      pMin = pMin,
      pMax = pMax,
      scale = scale,
      offset = offset,
      returnCounts = returnCounts,
      pdrOffsetRaw = buf.getInt(96),
      versionMajor = versionMajor,
      versionMinor = versionMinor,
      systemId = str(26, 32),
      software = str(58, 32),
      sourceId = buf.getShort(4),
      globalEncoding = buf.getShort(6),
      vlrCount = vlrCount,
      pdrLengthRaw = pdrLengthRaw,
      creationDay = buf.getShort(90),
      creationYear = buf.getShort(92),
      waveformOffset = waveformOffset,
      evlrOffset = evlrOffset,
      evlrCount = evlrCount,
      compressed = compressed)
  }
}
