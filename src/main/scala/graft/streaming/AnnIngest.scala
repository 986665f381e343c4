package graft.streaming

import graft.ops.Clustering
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest into a SERVED ANN layout — the st×ss composition a
  * live embedding index needs: micro-batches of landing vectors are
  * assigned through a LOADED (train-once) two-level model and appended
  * into the composite-cell layout that
  * [[graft.ops.Clustering.ivfTopKServedTwoLevel]] serves from, under the
  * streaming sink's idempotence discipline (the
  * `PointCloudStreamingWrite` query-token convention): every file an
  * epoch lands is named `part-<epochId>-<seq>-<queryToken>.parquet`, and
  * re-processing an epoch (a restarted query replaying from its
  * checkpoint) first REMOVES that epoch's files and then lands them
  * again — exactly-once layout contents from an at-least-once batch
  * callback.
  *
  * Scale shape: each batch pays one coarse pass + one fine equi-join
  * over ITS OWN rows (never the layout), the staging write is one
  * cell-partitioned shuffle of the batch, and the rename fan-in is
  * metadata-only. The layout is never read, so ingest cost is
  * proportional to the batch at any index size — the same contract as
  * the batch append (ss16/ss18).
  */
object AnnIngest {

  /** Epoch-idempotent append of one micro-batch (the `foreachBatch`
    * callback body). `queryToken` must be STABLE across restarts of the
    * same logical query (use the checkpointed query id or a caller
    * token, never the per-run runId) — the (token, epochId) pair is
    * what makes a replayed epoch overwrite itself instead of
    * duplicating. */
  def appendBatchIdempotent(batch: DataFrame, epochId: Long, idCol: String,
      vecCol: String, model: Clustering.TwoLevelModel, path: String,
      queryToken: String): Unit = {
    require(queryToken.nonEmpty &&
      queryToken.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"queryToken must be a filename-safe stable token, got '$queryToken'")
    require(epochId >= 0, s"epochId must be non-negative, got $epochId")
    val spark = batch.sparkSession
    val assigned = Clustering.assignCellsTwoLevel(
      batch.select(col(idCol).as("id"), col(vecCol).as("embedding"),
          transform(col(vecCol), _.cast("double")).as("__v"))
        .localCheckpoint(eager = true), // same inlining guard as kmeans
      "id", "__v", model).drop("__v")
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    // stage under a dot-prefixed dir INSIDE the layout (same filesystem,
    // so the promotion below is a metadata rename; readers ignore hidden
    // dirs, so a crash mid-stage never corrupts a serve)
    val stage = new Path(root, s".graft-stage-$queryToken-$epochId")
    assigned.write.partitionBy("cell").mode("overwrite").parquet(stage.toString)
    // the replay rule, step 1: remove every file this (token, epoch)
    // pair landed in a previous attempt — the batch content is the
    // checkpoint's replayed offsets, but its FILE SPLIT need not be
    // byte-reproducible, so delete-then-land is the robust idempotence
    val namePat = s"^part-$epochId-\\d+-$queryToken\\.parquet$$".r
    fs.listStatus(root).iterator
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .foreach { d =>
        fs.listStatus(d.getPath).iterator
          .filter(f => namePat.findFirstIn(f.getPath.getName).isDefined)
          .foreach(f => fs.delete(f.getPath, false))
      }
    // step 2: promote the staged files under their deterministic names
    fs.listStatus(stage).iterator
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .foreach { d =>
        val dest = new Path(root, d.getPath.getName)
        fs.mkdirs(dest)
        val files = fs.listStatus(d.getPath).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        files.zipWithIndex.foreach { case (src, i) =>
          val dst = new Path(dest, s"part-$epochId-$i-$queryToken.parquet")
          require(fs.rename(src, dst), s"promote $src -> $dst failed")
        }
      }
    fs.delete(stage, true)
  }
}
