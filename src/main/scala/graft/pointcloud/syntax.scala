package graft.pointcloud

import org.apache.spark.sql.{DataFrame, DataFrameReader, DataFrameWriter}

/** Reader/writer sugar matching the reference's public API surface
  * (`sqlContext.read.las(path)` / `df.write.ply(path)` — ply/package
  * .scala:28-38, las/package.scala:29-43, xyz/package.scala:28-38).
  *
  * Writes default to overwrite-in-place of the target directory (the
  * DSv2 path-based write contract requires Append or Overwrite; fresh
  * output directories make Overwrite the natural default) and smuggle the
  * query schema through the `__schema` option so schema resolution works
  * on empty target paths.
  */
object syntax {

  implicit class PointCloudDataFrameReader(private val r: DataFrameReader) extends AnyVal {
    /** Read option `bbox` = `"xlo,xhi,ylo,yhi,zlo,zhi"` (exposed-schema
      * coordinate domain, `*` for an unbounded side): an explicit
      * spatial subscription, exact at the record level, that also
      * drives header file-skip and COPC chunk pruning at planning. It
      * is THE pushdown channel for `readStream` (Spark never pushes
      * predicates into a micro-batch source); on batch reads a plain
      * `.where` gets the same pruning automatically. las/ply only.
      *
      * Read option `timerange` = `"lo,hi"` (gpstime domain, `*` for an
      * unbounded side): the TEMPORAL subscription twin — exact at the
      * record level, and over COPC files it skips whole out-of-range
      * files at planning via the info VLR's gps span. Same option in
      * batch and streaming; requires a pushable `time` column.
      *
      * Read option `copc.maxlevel` = `K` over a [[PointCloudDataFrame.writeCopc]]
      * LOD layout: the declared COARSE PREVIEW — only octree nodes at
      * level ≤ K are planned (~1/8 of the data per level below the
      * leaf), same option in batch and streaming. It CHANGES the result
      * set by contract, so a source that cannot honor it (non-COPC
      * file) is rejected rather than silently over-delivering. */
    def las(paths: String*): DataFrame = r.format("las").load(paths: _*)
    def ply(paths: String*): DataFrame = r.format("ply").load(paths: _*)
    def xyz(paths: String*): DataFrame = r.format("xyz").load(paths: _*)
  }

  implicit class PointCloudDataFrameWriter[T](private val w: DataFrameWriter[T]) extends AnyVal {
    private def write(format: String, path: String, schemaJson: String): Unit =
      w.format(format).option("__schema", schemaJson).mode("overwrite").save(path)

    def las(df: DataFrame, path: String): Unit = write("las", path, df.schema.json)
    def ply(df: DataFrame, path: String): Unit = write("ply", path, df.schema.json)
    def xyz(df: DataFrame, path: String): Unit = write("xyz", path, df.schema.json)
  }

  /** Scaled-coordinate reconstruction: for every column carrying
    * `scale`/`offset` metadata (stamped from the LAS header), append a
    * `<name>_d` double column with `value*scale + offset` — the
    * metadata-plus-arithmetic replacement for the reference's
    * ScaledInteger UDTs (ScaledIntegerType.scala:27-111, SURVEY §1.5). */
  def withCoordinates(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.metadata.contains("scale") && f.metadata.contains("offset"))
        acc.withColumn(s"${f.name}_d",
          col(f.name) * lit(f.metadata.getDouble("scale")) +
            lit(f.metadata.getDouble("offset")))
      else acc
    }
  }

  /** One output per source file, named after the source's basename —
    * the reference's commit-time `fid=<k>` → basename renaming (D3,
    * ply/PlyRelation.scala:60-80), rebuilt on the `paths` list stamped
    * in the fid column's metadata. Driver-loops one distributed write
    * per source file; suited to moderate file counts (the reference's
    * rename loop was driver-side too). Returns the written directories. */
  def writePerSource(df: DataFrame, outDir: String,
      format: String = "ply"): Seq[String] = {
    import org.apache.spark.sql.functions.col
    val meta = df.schema("fid").metadata
    require(meta.contains("paths"), "fid column carries no source paths metadata")
    val paths = meta.getStringArray("paths")
    paths.zipWithIndex.map { case (src, fid) =>
      val base = new java.io.File(src).getName.replaceAll("\\.[^.]+$", "")
      val target = s"$outDir/$base"
      val part = df.filter(col("fid") === fid)
      format match {
        case "ply" => PointCloudDataFrame(part).writePly(target, Map("merge" -> "true"))
        case "las" => PointCloudDataFrame(part).writeLas(target)
        case "xyz" => PointCloudDataFrame(part).writeXyz(target)
      }
      target
    }.toSeq
  }

  /** Compact a fragmented COPC directory — the lake-maintenance pass
    * that follows a season of [[PointCloudDataFrame.writeCopc]] appends:
    * many small per-batch files (each with its own cube and octree)
    * read back as one frame and rewritten into a FRESH layout at
    * `outDir`, typically with `copc.files` set so the result is
    * spatially disjoint again and both pruning tiers bite at full
    * strength. Out-of-place by design: the source directory stays
    * readable throughout, and the caller swaps directories on success —
    * the same discipline as parquet table compaction. Pass the lake's
    * `scale`/`offset` (raw integer coordinates are interpreted under
    * them; a lake written under one world frame compacts under the same
    * one). Row CONTENT is preserved exactly — fid/pid are positional
    * ids any read re-derives — and pc34 grades the census equality
    * through a bbox read of the compacted layout. */
  def compactCopc(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      outDir: String, options: Map[String, String] = Map.empty): Unit =
    new PointCloudDataFrame(spark.read.format("las").load(srcDir))
      .writeCopc(outDir, options)

  /** TAKEDOWN from a COPC directory — dd18's legal-removal story at the
    * point-cloud lake: remove every point whose gpstime falls in
    * [timeLo, timeHi] WITHOUT a full-lake rewrite. One PRUNED distributed
    * pass locates the affected files (the info VLR's gps range skips
    * disjoint files at planning and the octree prunes chunks, so the
    * locate cost is proportional to the WINDOW's share of the lake, not
    * the lake); then per affected file: fully-emptied files are deleted
    * outright, straddling files are rewritten IN PLACE from their
    * surviving points (own cube/octree over the survivors — the same
    * per-file-metadata discipline as `writeCopc(mode = "append")`), and
    * untouched files are never opened, let alone rewritten. The rewrite
    * loop is driver-sequenced one distributed write per affected file
    * ([[writePerSource]]'s discipline) — a takedown window touches few
    * files by construction; a window spanning the whole lake is a
    * compaction job, use [[compactCopc]] with a filter instead. Null
    * times never match the window (a legal removal names a concrete
    * span). Pass the lake's `scale`/`offset` options like
    * [[compactCopc]]. Returns the affected file paths (rewritten or
    * deleted). */
  def deleteFromCopc(spark: org.apache.spark.sql.SparkSession, dir: String,
      timeLo: Double, timeHi: Double,
      options: Map[String, String] = Map.empty): Seq[String] = {
    import org.apache.spark.sql.functions.col
    require(timeLo <= timeHi, s"empty takedown window [$timeLo, $timeHi]")
    val df = spark.read.format("las").load(dir)
    val meta = df.schema("fid").metadata
    require(meta.contains("paths"), "fid column carries no source paths metadata")
    val paths = meta.getStringArray("paths")
    val removeP = col("time").isNotNull &&
      col("time") >= timeLo && col("time") <= timeHi
    // the pruned locate pass: files disjoint from the window drop at the
    // gps file-skip tier and never decode a chunk
    val affected = df.where(removeP).select(col("fid")).distinct()
      .collect().map(_.getAs[Number](0).intValue).sorted
    val conf = new org.apache.hadoop.conf.Configuration()
    // per-file rewrites are INDEPENDENT Spark jobs (each reads only its
    // own source file and swaps only its own path), so they run from a
    // small driver thread pool — the optimization-guide §2.6 shape: the
    // next file's locate/encode tasks back-fill executors freed by the
    // previous file's coalesce(1) tail instead of serializing a
    // many-file takedown behind one single-task write at a time. Result
    // order (and each file's bytes, derived only from its own
    // survivors) is unchanged; failures propagate like the serial
    // loop's (first failing file throws, files already swapped stay
    // swapped — each swap is individually crash-safe via its backup).
    def rewriteOne(fid: Int): String = {
      val src = paths(fid)
      // the in-place swap below writes a COPC .laz body — renaming it
      // under a .las/.xyz name would corrupt a mixed directory, so the
      // takedown refuses loudly rather than guessing
      require(src.endsWith(".laz"),
        s"deleteFromCopc only rewrites COPC .laz files, found affected $src")
      val srcPath = new org.apache.hadoop.fs.Path(src)
      val fs = srcPath.getFileSystem(conf)
      val survivors = spark.read.format("las").load(src).where(!removeP)
      if (survivors.isEmpty) {
        require(fs.delete(srcPath, false), s"takedown failed to delete $src")
      } else {
        // in-place rewrite via an out-of-place write + atomic-ish swap:
        // the new file keeps the ORIGINAL name so directory readers and
        // any recorded path stay valid. Crash-safety ordering: the
        // original is RENAMED to a visible backup (non-.laz suffix, so
        // directory readers skip it) BEFORE the swap and deleted only
        // after the swap succeeds — a crash mid-swap leaves either the
        // original in place or the backup recoverable by renaming
        // `<name>.takedown-bak` back; at no point is the only copy of
        // the source under a hidden temp name
        val tmp = new org.apache.hadoop.fs.Path(
          srcPath.getParent, s".graft-takedown-${srcPath.getName}")
        fs.delete(tmp, true)
        new PointCloudDataFrame(survivors.coalesce(1))
          .writeCopc(tmp.toString, options)
        val produced = fs.listStatus(tmp)
          .map(_.getPath).filter(_.getName.endsWith(".laz"))
        require(produced.length == 1,
          s"takedown rewrite of $src produced ${produced.length} files")
        val bak = new org.apache.hadoop.fs.Path(
          srcPath.getParent, s"${srcPath.getName}.takedown-bak")
        fs.delete(bak, false)
        require(fs.rename(srcPath, bak),
          s"takedown failed to back up $src -> $bak")
        if (!fs.rename(produced.head, srcPath)) {
          // restore the original before failing — no data-loss window
          fs.rename(bak, srcPath)
          sys.error(s"takedown failed to swap ${produced.head} -> $src")
        }
        fs.delete(bak, false)
        fs.delete(tmp, true)
      }
      src
    }
    if (affected.length <= 1) affected.map(rewriteOne).toSeq
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(4, affected.length))
      try {
        val futures = affected.map(fid =>
          pool.submit(new java.util.concurrent.Callable[String] {
            override def call(): String = rewriteOne(fid)
          }))
        futures.map(_.get()).toSeq
      } catch {
        // unwrap so callers see the same exception type as the serial path
        case e: java.util.concurrent.ExecutionException => throw e.getCause
      } finally pool.shutdown()
    }
  }

  /** Dataset-side sugar so callers don't have to repeat the frame:
    * `df.writeLas(path)` etc. */
  implicit class PointCloudDataFrame(private val df: DataFrame) extends AnyVal {
    private def write(format: String, path: String,
        options: Map[String, String], mode: String = "overwrite"): Unit = {
      var w = df.write.format(format).option("__schema", df.schema.json).mode(mode)
      options.foreach { case (k, v) => w = w.option(k, v) }
      w.save(path)
    }

    def writeLas(path: String, options: Map[String, String] = Map.empty): Unit =
      write("las", path, options)
    /** LASzip-compressed LAS (`.laz`) — same sink as [[writeLas]] with
      * the per-chunk entropy codec switched on (`laz.chunkSize` option
      * tunes the chunk size; all point formats 0–10, ExtraBytes columns
      * ride as the BYTE/BYTE14 item). The reference rejects compressed files
      * outright (FixedLengthBinarySectionInputFormat.scala:48-56).
      *
      * Interop status: the codec is a from-scratch implementation of the
      * published LASzip schemes, verified by self-round-trip and frozen
      * golden bytes — this container ships no external `.laz` fixture or
      * LASzip binary, so byte compatibility with foreign tools is
      * unverified here (strongest for formats 0–5, the longest-published
      * scheme; the native-1.4 layered path for 6–10 shares that caveat).
      * Files written by this sink always re-read exactly through
      * `spark.read.las`. */
    def writeLaz(path: String, options: Map[String, String] = Map.empty): Unit =
      write("las", path, options + ("compress" -> "laz"))
    /** COPC (Cloud-Optimized Point Cloud, the published copc.io layout):
      * [[writeLaz]] with octree-keyed chunking plus the `copc` info VLR
      * and hierarchy EVLR, so a bbox read PRUNES whole chunks at
      * planning time (`spark.read.las(dir).where(bbox)` decodes only
      * intersecting octree nodes — row-group-stats pruning for point
      * clouds). One columnar agg pass derives the enclosing cube and a
      * density-matched octree level; rows are then sorted WITHIN
      * partitions by voxel key (no shuffle) so each node lands as a
      * contiguous chunk run. Every task file carries its own octree
      * over the shared global cube; `copc.files = N` additionally
      * RANGE-PARTITIONS the frame on the voxel key (one shuffle) so the
      * N output files cover DISJOINT key ranges — each file's header
      * bbox then encloses only its own region and whole files drop at
      * the [[graft.pointcloud.connector.SectionSkip]] level before any
      * chunk bound is even consulted, the two-tier pruning a 100-TB
      * corpus needs (thousands of files × thousands of chunks). Without
      * it the write is shuffle-free and file skipping still applies,
      * just with whatever spatial overlap the input partitioning had.
      * Requires point format 6-8 columns (COPC is a LAS 1.4 layered-LAZ
      * profile). `copc.lod = true` additionally distributes points
      * across octree LEVELS by a deterministic integer hash of the raw
      * coordinates (~1/8 promoted per level — the published COPC shape
      * where coarse levels hold a subsample), enabling the
      * `copc.maxlevel` coarse-preview READ option: an approximate
      * census at a fixed fraction of the scan cost, served by the SAME
      * file as the exact read. Options: `copc.nodepoints` (target
      * points per leaf node, default 16384), `copc.level` (explicit
      * leaf level), `copc.lod`, `copc.chunkcap`, `copc.files`,
      * `copc.pageentries` (per-page hierarchy entry budget — past it
      * the hierarchy EVLR splits into the published page graph of
      * child-page references instead of one monolithic root page, the
      * shape a streaming viewer fetches page-by-page; default one root
      * page), plus all [[writeLas]] options. Interop caveat as
      * [[writeLaz]]. A voxel whose points overflow `copc.chunkcap`
      * SPLITS LEVEL-LOCALLY into child voxels (recursively), so every
      * hierarchy key stays single-entry — the published
      * one-entry-per-node shape; runs past `copc.overflowbuffer`
      * points (default 8× the cap — the split's in-MEMORY bound) spill
      * to a task-local temp file and split from disk, so the guarantee
      * is unconditional on run length. Narrow residual caveat: LOD
      * layouts (`copc.lod`, where splitting an interior subsample
      * level would collide with real child-level data) and single
      * voxels denser than a chunk cap at the depth bound (level 19)
      * still emit several chunks sharing one key, which this repo's
      * reader sums per key but a foreign reader may mishandle.
      *
      * `mode = "append"` LANDS this frame as NEW files beside an
      * existing COPC directory without touching the old ones — the
      * daily-ingest shape of a living point-cloud lake: each appended
      * file derives its OWN enclosing cube and octree over its own
      * rows (COPC metadata is per-file), so bbox/gpstime pruning keeps
      * working over the union, file-level first, then chunk-level. A
      * batch-wide rewrite would re-shuffle the whole corpus; the append
      * touches only the new rows. */
    def writeCopc(path: String, options: Map[String, String] = Map.empty,
        mode: String = "overwrite"): Unit = {
      import org.apache.spark.sql.functions.{coalesce, col, count, floor, greatest, least, lit, max, min, pow, when}
      // option lookup mirroring the DSv2 writer's case-insensitive map
      // exactly: lowercase-fold with LAST occurrence winning, the
      // CaseInsensitiveStringMap putAll rule — a different duplicate-key
      // resolution here could derive the cube in one world frame while
      // the writer encodes in another
      val ciOpts = options.foldLeft(Map.empty[String, String]) {
        case (m, (k, v)) => m + (k.toLowerCase(java.util.Locale.ROOT) -> v)
      }
      def opt(key: String): Option[String] =
        ciOpts.get(key.toLowerCase(java.util.Locale.ROOT))
      // the SAME scale/offset parser the writer uses (WriterUtil.parse3):
      // the cube must be derived in exactly the writer's world frame
      val sc = connector.WriterUtil.parse3(opt, "scale", 1.0)
      val off = connector.WriterUtil.parse3(opt, "offset", 0.0)
      // null coordinates ENCODE as raw 0 (the writeLas/writeLaz
      // contract), so the cube is derived over the encoded value — a
      // frame with nulls and a far-from-zero bbox must still produce a
      // cube that encloses raw 0 or the writer rejects its own input
      def enc(c: String) = coalesce(col(c), lit(0))
      val r = df.agg(
        min(enc("x")), max(enc("x")), min(enc("y")), max(enc("y")),
        min(enc("z")), max(enc("z")), count(lit(1))).head()
      val n = r.getLong(6)
      def world(i: Int, a: Int): Double =
        if (r.isNullAt(i)) 0.0 else r.getInt(i) * sc(a) + off(a)
      val lo = Array.tabulate(3)(a => world(2 * a, a))
      val hi = Array.tabulate(3)(a => world(2 * a + 1, a))
      val ctr = Array.tabulate(3)(a => (lo(a) + hi(a)) / 2)
      // pad the halfsize so the extreme points sit strictly inside the
      // cube under fp re-assembly (the writer re-checks with its own
      // tolerance; the pad keeps honest data clear of that boundary)
      val half = math.max(
        (0 until 3).map(a => (hi(a) - lo(a)) / 2).max * (1 + 1e-9) + 1e-9, 1e-6)
      val target = opt("copc.nodepoints").map { s =>
        try s.trim.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"copc.nodePoints '$s' is not an integer")
        }
      }.getOrElse(16384)
      require(target > 0, s"copc.nodePoints must be positive, got $target")
      // an explicit copc.level wins (a caller wanting an oracle- or
      // interop-exact leaf level states it in integer arithmetic);
      // otherwise density-match: the smallest level whose 8^l leaves
      // average <= copc.nodepoints points
      val level = opt("copc.level") match {
        case Some(s) =>
          val l = s.trim.toInt
          require(l >= 0 && l <= graft.pointcloud.las.laz.Copc.MaxLevel,
            s"copc.level must be in 0..${graft.pointcloud.las.laz.Copc.MaxLevel}, got $l")
          l
        case None =>
          if (n <= target) 0
          else math.min(graft.pointcloud.las.laz.Copc.MaxLevel,
            math.ceil(math.log(n.toDouble / target) / math.log(8)).toInt)
      }
      val nSide = 1 << level
      val side = 2 * half / nSide
      def k(c: String, a: Int) =
        least(lit(nSide - 1L), greatest(lit(0L),
          floor((enc(c).cast("double") * sc(a) + off(a) - (ctr(a) - half)) / side)))
      val key = (k("x", 0) * nSide + k("y", 1)) * nSide + k("z", 2)
      // copc.lod: rows are chunked by (level, voxel-at-level), so the
      // within-partition sort goes LEVEL-major with the same
      // deterministic hash arithmetic the writer applies (Copc.lodHash/
      // lodLevel — integer-exact, oracle-rederivable). Range
      // partitioning (copc.files) stays on the LEAF voxel key either
      // way: spatial disjointness across files is a leaf-geometry
      // property, and each file's coarse chunks hold only its own rows.
      val lod = opt("copc.lod").exists(_.toBoolean)
      val sortCols: Seq[org.apache.spark.sql.Column] =
        if (!lod) Seq(key)
        else {
          val h = (enc("x").cast("long") * 73856093L)
            .bitwiseXOR(enc("y").cast("long") * 19349663L)
            .bitwiseXOR(enc("z").cast("long") * 83492791L)
          val promo = when(h % 8 =!= 0, 0).when(h % 64 =!= 0, 1)
            .when(h % 512 =!= 0, 2).when(h % 4096 =!= 0, 3).otherwise(4)
          val lvl = greatest(lit(0), lit(level) - promo)
          val nL = pow(lit(2.0), lvl) // exact doubles through level 19
          val sideL = lit(2 * half) / nL
          def kAt(c: String, a: Int) =
            least(nL - 1, greatest(lit(0.0),
              floor((enc(c).cast("double") * sc(a) + off(a) - (ctr(a) - half)) / sideL)))
          Seq(lvl, kAt("x", 0), kAt("y", 1), kAt("z", 2))
        }
      val arranged = opt("copc.files") match {
        case Some(f) =>
          val nf = try f.trim.toInt catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"copc.files '$f' is not an integer")
          }
          require(nf > 0, s"copc.files must be positive, got $nf")
          df.repartitionByRange(nf, key).sortWithinPartitions(sortCols: _*)
        case None => df.sortWithinPartitions(sortCols: _*)
      }
      new PointCloudDataFrame(arranged).write("las", path,
        options ++ Map(
          "compress" -> "laz",
          "copc.cube" -> s"${ctr(0)},${ctr(1)},${ctr(2)},$half",
          "copc.level" -> level.toString),
        mode)
    }
    def writePly(path: String, options: Map[String, String] = Map.empty): Unit =
      write("ply", path, options)
    def writeXyz(path: String, options: Map[String, String] = Map.empty): Unit =
      write("xyz", path, options)

    /** Streaming-sink sugar: a configured `DataStreamWriter` targeting the
      * point-cloud sink (append mode; each epoch's task files are
      * self-contained `epoch-<e>-q<query-token>-part-*.<ext>`, the token
      * scoping replay cleanup to this query's own files). The caller still sets
      * trigger/checkpoint and calls `.start()`. The query schema rides in
      * `__schema` exactly like the batch sugar — the sink dir may be
      * empty, so there is nothing to infer from. */
    def writeStreamPointCloud(format: String, path: String,
        options: Map[String, String] = Map.empty)
        : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
      var w = df.writeStream.format(format)
        .option("__schema", df.schema.json).option("path", path)
      options.foreach { case (k, v) => w = w.option(k, v) }
      w
    }

    /** Single-pass partition-keyed save: ONE distributed write that emits
      * one self-contained `<key>.<ext>` file per distinct value of
      * `keyCol` — the reference's `$key.las` naming sugar (K2,
      * las/package.scala:45-98) without a driver loop of per-key jobs.
      * Repartitioning by the key clusters each key into exactly one task;
      * the within-partition sort lets the task writer stream one file at
      * a time. The key column itself is encoded in the file name, not the
      * records (duplicate it under another name to also store it). */
    def writeKeyed(format: String, path: String, keyCol: String,
        options: Map[String, String] = Map.empty): Unit = {
      import org.apache.spark.sql.functions.col
      val keyed = df.repartition(col(keyCol)).sortWithinPartitions(keyCol)
      var w = keyed.write.format(format).option("__schema", keyed.schema.json)
        .option("keyColumn", keyCol).mode("overwrite")
      options.foreach { case (k, v) => w = w.option(k, v) }
      w.save(path)
    }
    def writeLasKeyed(path: String, keyCol: String,
        options: Map[String, String] = Map.empty): Unit = writeKeyed("las", path, keyCol, options)
    def writePlyKeyed(path: String, keyCol: String,
        options: Map[String, String] = Map.empty): Unit = writeKeyed("ply", path, keyCol, options)
    def writeXyzKeyed(path: String, keyCol: String,
        options: Map[String, String] = Map.empty): Unit = writeKeyed("xyz", path, keyCol, options)
  }
}
