package graft.pointcloud.ply

import java.io.{DataOutputStream, InputStream}
import java.nio.charset.StandardCharsets

import graft.pointcloud.Section
import org.apache.spark.sql.types._

/** Binary PLY header codec (public PLY format; exercised by the reference
  * at ply/PlyHeader.scala:156-204).
  *
  * Supports `format binary_little_endian 1.0` and `binary_big_endian 1.0`
  * with scalar properties only — ASCII bodies and list properties are
  * rejected, as in the reference (ply/PlyHeader.scala:185-195). Unsigned
  * property types map to signed Spark types of the same width
  * (ply/PlyHeader.scala:30-42), so values above the signed max wrap.
  */
object PlyTypes {
  val toDataType: Map[String, DataType] = Map(
    "char" -> ByteType, "int8" -> ByteType, "uchar" -> ByteType, "uint8" -> ByteType,
    "short" -> ShortType, "int16" -> ShortType, "ushort" -> ShortType, "uint16" -> ShortType,
    "int" -> IntegerType, "int32" -> IntegerType, "uint" -> IntegerType, "uint32" -> IntegerType,
    "long" -> LongType, "int64" -> LongType, "ulong" -> LongType, "uint64" -> LongType,
    "float" -> FloatType, "float32" -> FloatType,
    "double" -> DoubleType, "float64" -> DoubleType)

  def typeName(dt: DataType): String = dt match {
    case ByteType    => "char"
    case ShortType   => "short"
    case IntegerType => "int"
    case LongType    => "int64"
    case FloatType   => "float"
    case DoubleType  => "double"
    case other => throw new IllegalArgumentException(s"unsupported PLY type $other")
  }
}

case class PlyElement(name: String, count: Long, schema: StructType) {
  def recordLength: Int =
    schema.fields.map(f => graft.pointcloud.PointCloudTypes.sizeOf(f.dataType)).sum

  /** Element-wise merge: same name and properties required, counts sum
    * (reference ply/PlyHeader.scala:78-84). */
  def merge(that: PlyElement): PlyElement = {
    require(name == that.name && schema == that.schema,
      s"cannot merge PLY elements $name/$schema with ${that.name}/${that.schema}")
    copy(count = count + that.count)
  }
}

case class PlyHeader(
    location: String,
    littleEndian: Boolean,
    headerLength: Long,
    elements: Seq[PlyElement],
    comments: Seq[String] = Nil,
    objInfo: Seq[String] = Nil) {

  /** Sections for each element; element bodies are laid out back-to-back
    * after the ASCII header (reference ply/PlyHeader.scala:106-111). */
  def sections: Map[String, Section] = {
    val offsets = elements.map(e => e.count * e.recordLength).scanLeft(headerLength)(_ + _)
    elements.zip(offsets).map { case (e, off) =>
      e.name -> Section(location, off, e.count, littleEndian, e.schema)
    }.toMap
  }

  def headerText: String = {
    val sb = new StringBuilder
    sb ++= "ply\n"
    sb ++= s"format binary_${if (littleEndian) "little" else "big"}_endian 1.0\n"
    comments.foreach(c => sb ++= s"comment $c\n")
    objInfo.foreach(o => sb ++= s"obj_info $o\n")
    elements.foreach { e =>
      sb ++= s"element ${e.name} ${e.count}\n"
      e.schema.fields.foreach { f =>
        sb ++= s"property ${PlyTypes.typeName(f.dataType)} ${f.name}\n"
      }
    }
    sb ++= "end_header\n"
    sb.result()
  }

  def write(dos: DataOutputStream): Unit =
    dos.write(headerText.getBytes(StandardCharsets.US_ASCII))

  /** Header-level merge for the write commit (counts summed per element). */
  def merge(that: PlyHeader): PlyHeader = {
    require(littleEndian == that.littleEndian, "cannot merge PLY headers with different endianness")
    require(elements.map(_.name) == that.elements.map(_.name), "element lists differ")
    PlyHeader("", littleEndian, 0,
      elements.zip(that.elements).map { case (a, b) => a.merge(b) },
      comments ++ that.comments, objInfo ++ that.objInfo)
  }
}

object PlyHeader {

  /** Parse an ASCII PLY header; `headerLength` is the byte offset of the
    * first body byte. Handles both \n and \r\n line endings. */
  def read(location: String, in: InputStream): PlyHeader = {
    var offset = 0L
    // read one header line byte-by-byte (the stream must not over-read
    // past end_header, where the binary body starts)
    def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      // a truncated header (EOF before end_header) must fail, not spin: an
      // empty EOF read is indistinguishable from a blank line otherwise
      if (c == -1)
        throw new java.io.EOFException(s"$location: PLY header truncated (no end_header)")
      while (c != -1 && c != '\n') {
        sb.append(c.toChar)
        c = in.read()
        offset += 1
      }
      if (c == '\n') offset += 1
      if (sb.nonEmpty && sb.last == '\r') sb.deleteCharAt(sb.length - 1)
      sb.result()
    }

    val magic = readLine()
    require(magic == "ply", s"$location: not a PLY file (starts with '${magic.take(4)}')")

    var littleEndian = true
    var sawFormat = false
    var comments = Vector.empty[String]
    var objInfo = Vector.empty[String]
    var elements = Vector.empty[PlyElement]

    var line = readLine()
    while (line != "end_header") {
      line.split("\\s+").toSeq match {
        case Seq() | Seq("") => // blank
        case Seq("format", "binary_little_endian", "1.0") => littleEndian = true; sawFormat = true
        case Seq("format", "binary_big_endian", "1.0") => littleEndian = false; sawFormat = true
        case "format" +: _ =>
          throw new IllegalArgumentException(s"$location: unsupported PLY format: $line")
        case "comment" +: rest => comments :+= rest.mkString(" ")
        case "obj_info" +: rest => objInfo :+= rest.mkString(" ")
        case Seq("element", name, count) =>
          elements :+= PlyElement(name, count.toLong, StructType(Nil))
        case Seq("property", "list", _*) =>
          throw new IllegalArgumentException(s"$location: PLY list properties are unsupported")
        case Seq("property", typename, name) =>
          val dt = PlyTypes.toDataType.getOrElse(typename,
            throw new IllegalArgumentException(s"$location: unsupported PLY property type $typename"))
          val md =
            if (typename.startsWith("u"))
              new MetadataBuilder().putBoolean("unsigned", true).build()
            else Metadata.empty
          val last = elements.last
          elements = elements.init :+ last.copy(
            schema = StructType(last.schema.fields :+ StructField(name, dt, nullable = false, md)))
        case _ =>
          throw new IllegalArgumentException(s"$location: ill-formed PLY header line: $line")
      }
      line = readLine()
    }
    require(sawFormat, s"$location: PLY header missing format line")
    PlyHeader(location, littleEndian, offset, elements, comments, objInfo)
  }
}
