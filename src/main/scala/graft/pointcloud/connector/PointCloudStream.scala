package graft.pointcloud.connector

import org.apache.hadoop.conf.Configuration
import org.apache.spark.internal.Logging
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Streaming ingest of point-cloud directories (SURVEY §7.7): the file is
  * the unit of progress — an offset is the lexicographic high-watermark of
  * processed file names, so each micro-batch scans exactly the files whose
  * name sorts after the watermark. Unlike a positional (count) offset, a
  * watermark is stable when the listing shifts: a late file that sorts
  * before already-processed names can never cause re-emission of old files
  * (it is skipped with a warning — name files monotonically, e.g. by
  * timestamp, for complete ingest). Headers are read per batch on the
  * driver (exactly like the batch path), partitions are the same
  * record-aligned binary partitions, and fid numbering stays consistent
  * with the sorted listing.
  */
class PointCloudMicroBatchStream(
    kind: FormatKind,
    provider: PointCloudProvider,
    tableSchema: StructType,
    options: CaseInsensitiveStringMap,
    checkpointLocation: String)
  extends MicroBatchStream with Logging {

  /** Lexicographic high-watermark of processed file names ("" = none). */
  private case class FileNameOffset(lastFile: String) extends Offset {
    override def json(): String = lastFile
  }

  private def listFiles(): Seq[String] =
    PointCloudUtil.expandPaths(
      PointCloudUtil.explicitPaths(options), kind, new Configuration()).sorted

  override def initialOffset(): Offset = FileNameOffset("")

  override def latestOffset(): Offset = {
    val files = listFiles()
    FileNameOffset(if (files.isEmpty) "" else files.last)
  }

  override def deserializeOffset(json: String): Offset = FileNameOffset(json)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[FileNameOffset].lastFile
    val to = end.asInstanceOf[FileNameOffset].lastFile
    val files = listFiles()
    val maxBytes = SQLConf.get.filesMaxPartitionBytes
    files.zipWithIndex.flatMap { case (path, fid) =>
      // fid = position in the current sorted listing
      if (path <= from || path > to) {
        Nil // already processed (or beyond this batch's end watermark)
      } else
      try {
        provider.streamSections(path, options).flatMap { section =>
          val perPartition = math.max(1L, maxBytes / math.max(1, section.stride))
          (0L until section.count by perPartition).map { startRec =>
            val n = math.min(perPartition, section.count - startRec)
            BinaryPartition(section.location, section.offset, startRec, n,
              section.stride, section.littleEndian, fid, section.schema.json)
          }
        }
      } catch {
        case e: Exception =>
          logWarning(s"Skipping unreadable ${kind.name} file $path: ${e.getMessage}")
          Nil
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PointCloudReaderFactory(tableSchema.json)
}
