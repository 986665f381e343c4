package graft.pointcloud.las

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.types._

/** LAS variable-length-record and Extra Bytes handling (public LAS 1.4
  * spec §2.5 + the "Extra Bytes" VLR, LASF_Spec record id 4; exercised by
  * the reference at las/LasHeader.scala:47-145, 181-236).
  *
  * When a LAS header declares a record length greater than its point
  * format's base length, the tail bytes carry extra per-point fields. An
  * Extra Bytes VLR describes them (name, type, nodata/min/max/scale/offset);
  * without one, the tail is exposed as opaque byte columns.
  */
object LasExtraBytes {

  /** Random-access byte reader: (offset, length) => bytes. */
  type ReadAt = (Long, Int) => Array[Byte]

  private val ExtraBytesUserId = "LASF_Spec"
  private val ExtraBytesRecordId = 4
  private val StructSize = 192

  /** data_type 1..10 → on-disk type (unsigned mapped to signed same-width,
    * like the base formats). Index 0 = untyped raw bytes. */
  private val diskType: Array[DataType] = Array(
    ByteType,                 // 0: undocumented raw bytes
    ByteType, ByteType,       // 1 uchar, 2 char
    ShortType, ShortType,     // 3 ushort, 4 short
    IntegerType, IntegerType, // 5 ulong(u32), 6 long(i32)
    LongType, LongType,       // 7 u64, 8 i64
    FloatType, DoubleType)    // 9 float, 10 double

  private[las] case class Vlr(userId: String, recordId: Int, payloadOffset: Long, payloadLength: Long)

  /** Payloads of every (E)VLR matching (userId, recordId) — shared with
    * the LAZ reader, which looks up the `laszip encoded` record. */
  private[las] def findVlrPayloads(header: LasHeader, readAt: ReadAt,
      userId: String, recordId: Int): Seq[Array[Byte]] =
    readVlrs(header, readAt)
      .filter(v => v.userId == userId && v.recordId == recordId)
      .map(v => readAt(v.payloadOffset, v.payloadLength.toInt))

  /** Walk the VLR chain after the header (54-byte record headers) and the
    * EVLR chain (60-byte record headers, 64-bit lengths). */
  private def readVlrs(header: LasHeader, readAt: ReadAt): Seq[Vlr] = {
    def walk(n: Int, start: Long, headerLen: Int, extended: Boolean): Seq[Vlr] = {
      var off = start
      (0 until n).map { _ =>
        val hb = ByteBuffer.wrap(readAt(off, headerLen)).order(ByteOrder.LITTLE_ENDIAN)
        val userId = {
          val b = new Array[Byte](16); hb.position(2); hb.get(b)
          new String(b.takeWhile(_ != 0).map(_.toChar))
        }
        val recordId = hb.getShort(18) & 0xffff
        val len = if (extended) hb.getLong(20) else (hb.getShort(20) & 0xffff).toLong
        val v = Vlr(userId, recordId, off + headerLen, len)
        off += headerLen + len
        v
      }
    }
    walk(header.vlrCount, header.headerSize.toLong, 54, extended = false) ++
      (if (header.evlrCount > 0) walk(header.evlrCount, header.evlrOffset, 60, extended = true)
       else Nil)
  }

  /** Extra fields for `header`, or empty when the record has no tail.
    * Each described field carries nodata/min/max/scale/offset metadata
    * when the corresponding option bit is set. Pads any remaining
    * undescribed tail with opaque `extraN` byte columns.
    */
  def extraFields(header: LasHeader, readAt: ReadAt): Array[StructField] = {
    val tail = header.pdrLength - LasHeader.recordLength(header.pdrFormat)
    if (tail <= 0) return Array.empty

    val described: Array[StructField] =
      readVlrs(header, readAt)
        .filter(v => v.userId == ExtraBytesUserId && v.recordId == ExtraBytesRecordId)
        .flatMap { v =>
          val payload = readAt(v.payloadOffset, v.payloadLength.toInt)
          (0 until payload.length / StructSize).flatMap { i =>
            parseStruct(payload.slice(i * StructSize, (i + 1) * StructSize))
          }
        }.toArray

    val describedBytes = described.map(f =>
      graft.pointcloud.PointCloudTypes.sizeOf(f.dataType)).sum
    val pad = tail - describedBytes
    val padFields = if (pad > 0)
      Array.tabulate(pad)(i => StructField(s"extra$i", ByteType, nullable = false))
    else Array.empty[StructField]
    described ++ padFields
  }

  /** One 192-byte Extra Bytes struct → fields (deprecated composite types
    * 11..30 expand to 2 or 3 components). */
  private def parseStruct(bytes: Array[Byte]): Seq[StructField] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataTypeCode = bytes(2) & 0xff
    val options = bytes(3) & 0xff
    val name = new String(bytes.slice(4, 36).takeWhile(_ != 0).map(_.toChar))
    val desc = new String(bytes.slice(160, 192).takeWhile(_ != 0).map(_.toChar))

    val (dim, typ) =
      if (dataTypeCode == 0) (options, 0)
      else (((dataTypeCode - 1) / 10) + 1, ((dataTypeCode - 1) % 10) + 1)
    if (typ > 10) return Seq.empty // reserved

    val dt = diskType(typ)
    val integral = typ >= 1 && typ <= 8
    val hasNodata = (options & 1) != 0
    val hasMin = (options & 2) != 0
    val hasMax = (options & 4) != 0
    val hasScale = (options & 8) != 0
    val hasOffset = (options & 16) != 0

    val unsignedCode = typ >= 1 && typ <= 8 && typ % 2 == 1 // 1,3,5,7 = u8,u16,u32,u64
    (0 until dim).map { i =>
      val fieldName = if (dim == 1) name else s"$name$i"
      val md = new MetadataBuilder()
      if (unsignedCode) md.putBoolean("unsigned", true)
      if (typ != 0) {
        if (integral) {
          if (hasNodata) md.putLong("nodata", buf.getLong(40 + 8 * i))
          if (hasMin) md.putLong("min", buf.getLong(64 + 8 * i))
          if (hasMax) md.putLong("max", buf.getLong(88 + 8 * i))
        } else {
          if (hasNodata) md.putDouble("nodata", buf.getDouble(40 + 8 * i))
          if (hasMin) md.putDouble("min", buf.getDouble(64 + 8 * i))
          if (hasMax) md.putDouble("max", buf.getDouble(88 + 8 * i))
        }
        if (hasScale) md.putDouble("scale", buf.getDouble(112 + 8 * i))
        if (hasOffset) md.putDouble("offset", buf.getDouble(136 + 8 * i))
      }
      if (desc.nonEmpty) md.putString("description", desc)
      StructField(fieldName, dt, nullable = hasNodata, md.build())
    }
  }

  /** Serialize an Extra Bytes VLR (54-byte header + one 192-byte struct per
    * field) for the write path, so extra columns survive a round trip. */
  def writeVlr(fields: Array[StructField]): Array[Byte] = {
    val payload = new Array[Byte](StructSize * fields.length)
    fields.zipWithIndex.foreach { case (f, i) =>
      // slice() so absolute puts index from this struct's own region —
      // wrap(array, off, len) keeps index 0 at the ARRAY start, and
      // absolute puts from struct i>0 would silently overwrite struct 0
      val buf = ByteBuffer.wrap(payload, i * StructSize, StructSize)
        .slice().order(ByteOrder.LITTLE_ENDIAN)
      val typ = diskType.indexOf(f.dataType, 1)
      require(typ > 0, s"unsupported extra-bytes type ${f.dataType}")
      // we read unsigned as signed same-width, so emit the signed code of
      // each width: char=2, short=4, long(i32)=6, i64=8, float=9, double=10
      val code = if (typ <= 8) ((typ - 1) | 1) + 1 else typ
      var options = 0
      val md = f.metadata
      val integral = f.dataType != FloatType && f.dataType != DoubleType
      def putAny(off: Int, key: String): Unit =
        if (integral) buf.putLong(off, md.getLong(key)) else buf.putDouble(off, md.getDouble(key))
      if (md.contains("nodata")) { options |= 1; putAny(40, "nodata") }
      if (md.contains("min")) { options |= 2; putAny(64, "min") }
      if (md.contains("max")) { options |= 4; putAny(88, "max") }
      if (md.contains("scale")) { options |= 8; buf.putDouble(112, md.getDouble("scale")) }
      if (md.contains("offset")) { options |= 16; buf.putDouble(136, md.getDouble("offset")) }
      buf.put(2, code.toByte)
      buf.put(3, options.toByte)
      val nameBytes = f.name.getBytes("US-ASCII").take(31)
      var j = 0
      while (j < nameBytes.length) { buf.put(4 + j, nameBytes(j)); j += 1 }
    }
    val out = new Array[Byte](54 + payload.length)
    val hb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    val uid = ExtraBytesUserId.getBytes("US-ASCII")
    var j = 0
    while (j < uid.length) { hb.put(2 + j, uid(j)); j += 1 }
    hb.putShort(18, ExtraBytesRecordId.toShort)
    hb.putShort(20, payload.length.toShort)
    System.arraycopy(payload, 0, out, 54, payload.length)
    out
  }
}
