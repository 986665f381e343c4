package graft.pointcloud.connector

import java.nio.ByteBuffer

import graft.pointcloud.Section
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Vectorized decode for fixed-stride binary sections (SURVEY O7/§7.8):
  * records are read in ~4 MiB chunks and decoded column-at-a-time into
  * reused OnHeapColumnVectors — per-column tight loops over the strided
  * buffer instead of per-row virtual dispatch, and the scan feeds
  * Spark's ColumnarToRow/whole-stage codegen path.
  */
class BinarySectionColumnarReader(p: BinaryPartition, readSchema: StructType,
    predicate: RecordPredicate = null)
  extends PartitionReader[ColumnarBatch] {

  private val sectionSchema = DataType.fromJson(p.sectionSchemaJson).asInstanceOf[StructType]
  private val section = Section(p.location, p.sectionOffset, p.numRecords,
    p.littleEndian, sectionSchema, p.stride)

  private val path = new Path(p.location)
  private val in = path.getFileSystem(new Configuration()).open(path)
  in.seek(p.sectionOffset + p.startRecord * p.stride)

  private val batchSize: Int =
    math.max(1, math.min(p.numRecords, (4 << 20) / math.max(1, p.stride)).toInt)
  private val chunk = new Array[Byte](batchSize * p.stride)
  private val buf = ByteBuffer.wrap(chunk).order(section.order)

  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(batchSize, readSchema)
  private val batch = new ColumnarBatch(vectors.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]])

  // per output column: (kind, src offset, srcTag, dstTag, nodata info)
  // kind: 0=absent, 1=fid, 2=pid, 3=primitive
  private case class ColPlan(kind: Int, off: Int, srcTag: Int, dstTag: Int,
      hasNodata: Boolean, ndL: Long, ndD: Double, zeroExtend: Boolean = false)

  private val plans: Array[ColPlan] = readSchema.fields.map { f =>
    import graft.pointcloud.FieldDecoder.Tag
    if (f.name == PointCloudUtil.FidCol) ColPlan(1, 0, 0, 0, false, 0, 0)
    else if (f.name == PointCloudUtil.PidCol) ColPlan(2, 0, 0, 0, false, 0, 0)
    else {
      val i = section.fieldIndex(f.name)
      if (i < 0) ColPlan(0, 0, 0, 0, false, 0, 0)
      else {
        val md = sectionSchema.fields(i).metadata
        val srcTag = Tag.of(sectionSchema.fields(i).dataType)
        val hasNd = f.nullable && md.contains("nodata")
        val (ndL, ndD) =
          if (!hasNd) (0L, 0.0)
          else if (srcTag <= Tag.Long) (md.getLong("nodata"), 0.0)
          else (0L, md.getDouble("nodata"))
        val dstTag = Tag.of(f.dataType)
        val zeroExtend = srcTag < dstTag && dstTag <= Tag.Long &&
          md.contains("unsigned") && md.getBoolean("unsigned")
        ColPlan(3, section.fieldOffsets(i), srcTag, dstTag, hasNd, ndL, ndD, zeroExtend)
      }
    }
  }

  private var nextIdx = 0L // next record index within the partition

  // pushed-filter selection: indices of matching records within the chunk
  private val sel: Array[Int] = if (predicate == null) null else new Array[Int](batchSize)

  override def next(): Boolean = {
    while (true) {
      if (nextIdx >= p.numRecords) return false
      val n = math.min(batchSize.toLong, p.numRecords - nextIdx).toInt
      in.readFully(chunk, 0, n * p.stride)
      if (predicate == null) {
        var c = 0
        while (c < plans.length) {
          fillColumn(vectors(c), plans(c), n, nextIdx)
          c += 1
        }
        batch.setNumRows(n)
        nextIdx += n
        return true
      } else {
        // evaluate on the raw bytes first, then decode only the survivors
        // (ColumnarBatch has no selection vector, so compact while filling)
        var m = 0
        var i = 0
        while (i < n) {
          if (predicate.matches(buf, i * p.stride, p.startRecord + nextIdx + i)) {
            sel(m) = i; m += 1
          }
          i += 1
        }
        val base = nextIdx
        nextIdx += n
        if (m > 0) {
          var c = 0
          while (c < plans.length) {
            fillColumnSelected(vectors(c), plans(c), m, base)
            c += 1
          }
          batch.setNumRows(m)
          return true
        }
        // whole chunk filtered out — read the next one instead of
        // surfacing an empty batch
      }
    }
    false // unreachable
  }

  /** [[fillColumn]] over the `sel` selection (first `m` entries): decode
    * only the records the pushed filters kept. The decode body must stay
    * in LOCKSTEP with [[fillColumn]] (and the row-path FieldDecoder /
    * RecordPredicate value semantics) — the "selected decode path"
    * test compares the two loops row-for-row. Kept as a separate loop
    * deliberately: an index-indirection branch in the unfiltered hot
    * loop costs on every full scan. */
  private def fillColumnSelected(v: OnHeapColumnVector, pl: ColPlan, m: Int,
      base: Long): Unit = {
    import graft.pointcloud.FieldDecoder.Tag
    v.reset()
    pl.kind match {
      case 0 => v.putNulls(0, m)
      case 1 => v.putInts(0, m, p.fid)
      case 2 =>
        var j = 0
        while (j < m) { v.putLong(j, p.startRecord + base + sel(j)); j += 1 }
      case 3 =>
        val stride = p.stride
        val off = pl.off
        var j = 0
        if (pl.srcTag <= Tag.Long) {
          while (j < m) {
            val pos = sel(j) * stride + off
            var raw: Long = pl.srcTag match {
              case Tag.Byte  => buf.get(pos).toLong
              case Tag.Short => buf.getShort(pos).toLong
              case Tag.Int   => buf.getInt(pos).toLong
              case _         => buf.getLong(pos)
            }
            if (pl.zeroExtend) raw &= Tag.unsignedMask(pl.srcTag)
            if (pl.hasNodata && raw == pl.ndL) v.putNull(j)
            else pl.dstTag match {
              case Tag.Byte   => v.putByte(j, raw.toByte)
              case Tag.Short  => v.putShort(j, raw.toShort)
              case Tag.Int    => v.putInt(j, raw.toInt)
              case Tag.Long   => v.putLong(j, raw)
              case Tag.Float  => v.putFloat(j, raw.toFloat)
              case Tag.Double => v.putDouble(j, raw.toDouble)
            }
            j += 1
          }
        } else {
          while (j < m) {
            val pos = sel(j) * stride + off
            val raw: Double =
              if (pl.srcTag == Tag.Float) buf.getFloat(pos).toDouble else buf.getDouble(pos)
            if (pl.hasNodata && raw == pl.ndD) v.putNull(j)
            else if (pl.dstTag == Tag.Float) v.putFloat(j, raw.toFloat)
            else v.putDouble(j, raw)
            j += 1
          }
        }
    }
  }

  private def fillColumn(v: OnHeapColumnVector, pl: ColPlan, n: Int, base: Long): Unit = {
    import graft.pointcloud.FieldDecoder.Tag
    v.reset()
    pl.kind match {
      case 0 => v.putNulls(0, n)
      case 1 => v.putInts(0, n, p.fid)
      case 2 =>
        var i = 0
        while (i < n) { v.putLong(i, p.startRecord + base + i); i += 1 }
      case 3 =>
        val stride = p.stride
        val off = pl.off
        var i = 0
        if (pl.srcTag <= Tag.Long) {
          while (i < n) {
            val pos = i * stride + off
            var raw: Long = pl.srcTag match {
              case Tag.Byte  => buf.get(pos).toLong
              case Tag.Short => buf.getShort(pos).toLong
              case Tag.Int   => buf.getInt(pos).toLong
              case _         => buf.getLong(pos)
            }
            if (pl.zeroExtend) raw &= Tag.unsignedMask(pl.srcTag)
            if (pl.hasNodata && raw == pl.ndL) v.putNull(i)
            else pl.dstTag match {
              case Tag.Byte   => v.putByte(i, raw.toByte)
              case Tag.Short  => v.putShort(i, raw.toShort)
              case Tag.Int    => v.putInt(i, raw.toInt)
              case Tag.Long   => v.putLong(i, raw)
              case Tag.Float  => v.putFloat(i, raw.toFloat)
              case Tag.Double => v.putDouble(i, raw.toDouble)
            }
            i += 1
          }
        } else {
          while (i < n) {
            val pos = i * stride + off
            val raw: Double =
              if (pl.srcTag == Tag.Float) buf.getFloat(pos).toDouble else buf.getDouble(pos)
            if (pl.hasNodata && raw == pl.ndD) v.putNull(i)
            else if (pl.dstTag == Tag.Float) v.putFloat(i, raw.toFloat)
            else v.putDouble(i, raw)
            i += 1
          }
        }
    }
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    in.close()
    batch.close()
  }
}
