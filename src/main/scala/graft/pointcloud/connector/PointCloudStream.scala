package graft.pointcloud.connector

import org.apache.hadoop.conf.Configuration
import org.apache.spark.internal.Logging
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Streaming ingest of point-cloud directories (SURVEY §7.7): the file is
  * the unit of progress — an offset is "how many files of the sorted
  * directory listing have been processed", so each micro-batch scans only
  * newly arrived files. Headers are read per batch on the driver (exactly
  * like the batch path), partitions are the same record-aligned binary
  * partitions, and fid numbering stays consistent with the sorted listing.
  */
class PointCloudMicroBatchStream(
    kind: FormatKind,
    provider: PointCloudProvider,
    tableSchema: StructType,
    options: CaseInsensitiveStringMap,
    checkpointLocation: String)
  extends MicroBatchStream with Logging {

  private case class FileCountOffset(count: Long) extends Offset {
    override def json(): String = count.toString
  }

  private def listFiles(): Seq[String] =
    PointCloudUtil.expandPaths(
      PointCloudUtil.explicitPaths(options), kind, new Configuration()).sorted

  override def initialOffset(): Offset = FileCountOffset(0)

  override def latestOffset(): Offset = FileCountOffset(listFiles().size.toLong)

  override def deserializeOffset(json: String): Offset = FileCountOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[FileCountOffset].count.toInt
    val to = end.asInstanceOf[FileCountOffset].count.toInt
    val files = listFiles()
    val newFiles = files.slice(from, math.min(to, files.size))
    val maxBytes = SQLConf.get.filesMaxPartitionBytes
    newFiles.zipWithIndex.flatMap { case (path, i) =>
      val fid = from + i // position in the sorted listing
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
