package graft.pointcloud.connector

import java.io.{BufferedReader, InputStreamReader}
import java.nio.ByteBuffer

import graft.pointcloud.{RecordDecoder, Section}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, SpecificInternalRow}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources.{And => FAnd, EqualTo => FEq, Filter => SourceFilter, GreaterThan => FGt, GreaterThanOrEqual => FGe, In => FIn, LessThan => FLt, LessThanOrEqual => FLe, Or => FOr}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** ScanBuilder with column pruning (reference P1: only requested fields
  * are decoded, BinarySectionRelation.scala:165-181) and complete
  * aggregate pushdown answering COUNT/MIN/MAX from headers with zero data
  * IO (reference A1/A2, ExtraStrategies.scala:35-86 — rebuilt on the
  * standard DSv2 contract instead of a custom SparkStrategy).
  */
class PointCloudScanBuilder(
    kind: FormatKind,
    resolved: ResolvedPointCloud,
    tableSchema: StructType,
    options: CaseInsensitiveStringMap,
    provider: PointCloudProvider = null)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters
  with SupportsPushDownLimit
  with SupportsPushDownAggregates {

  private var readSchema: StructType = tableSchema
  private var pushedAggRow: Option[(StructType, Array[Array[Any]])] = None
  /** Explicit subscriptions (`bbox` + `timerange` read options, see
    * [[BboxOption]] / [[TimeRangeOption]]): synthesized filters seeded
    * into BOTH pushdown layers so the declared region binds even when
    * the query carries no WHERE — the batch twin of the streaming
    * source's only pushdown channel (DSv2 micro-batch planning never
    * calls pushFilters). */
  private val bboxFilters: Array[SourceFilter] =
    BboxOption.filters(kind, tableSchema, options) ++
      TimeRangeOption.filters(kind, tableSchema, options)
  private var skipFilters: Array[SourceFilter] = bboxFilters
  private var recordFilters: Array[SourceFilter] = bboxFilters
  private var limit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit =
    readSchema = requiredSchema

  /** Two pushdown layers (reference: none — SURVEY §2.3 P4):
    *  - file skip: ALL filters prune whole sections against LAS header
    *    pmin/pmax at planning time (conservative, never a correctness
    *    dependency);
    *  - record skip: filters the binary readers can evaluate exactly
    *    (numeric comparisons in the exposed-schema domain, null-aware)
    *    are claimed as pushed and dropped from Spark's residual — a
    *    selective range scan never materializes non-matching rows.
    * XYZ text reads keep everything residual (values only exist after
    * per-line parsing, where Spark's own codegen filter is as good).
    */
  override def pushFilters(filters: Array[SourceFilter]): Array[SourceFilter] = {
    skipFilters = bboxFilters ++ filters
    // LAZ sections decode whole chunks anyway (a record predicate saves
    // no entropy-decode work), and the record readers evaluate pushed
    // filters on RAW record bytes — keep everything residual when any
    // section is compressed; header-bbox file skip still applies.
    // option-derived filters (bbox / timerange) are NOT residual-
    // droppable (Spark never saw them) so they stay in the
    // reader-applied set unconditionally.
    val (push, residual) =
      if (kind == FormatKind.Xyz || resolved.sections.exists(_.laz.isDefined))
        (Array.empty[SourceFilter], filters)
      else filters.partition(RecordPredicate.pushable(_, tableSchema))
    recordFilters = bboxFilters ++ push
    residual
  }
  override def pushedFilters(): Array[SourceFilter] = recordFilters

  /** Header counts make limit-aware planning exact when no record-level
    * filter is pushed: plan only the leading partitions covering `limit`
    * records. (With pushed filters the per-file match count is unknown;
    * with XYZ there is no header count.) */
  override def pushLimit(l: Int): Boolean = {
    if (kind == FormatKind.Xyz || recordFilters.nonEmpty) false
    else { limit = l; true }
  }

  private def sectionMayMatch(sf: SectionWithFid, filters: Array[SourceFilter]): Boolean =
    SectionSkip.mayMatch(sf, filters)

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    computeAggregation(aggregation).isDefined

  override def pushAggregation(aggregation: Aggregation): Boolean =
    computeAggregation(aggregation) match {
      case Some(result) => pushedAggRow = Some(result); true
      case None => false
    }

  /** Try to answer the aggregation from headers alone. Returns the output
    * schema + result rows (one row globally, or one per fid when grouped
    * by fid), or None when not coverable. MIN/MAX(x|y|z) unscale header
    * pmin/pmax back to raw ints exactly (no `.toInt` truncation — fixes
    * the reference's ExtraStrategies.scala:57-62 caveat flagged in
    * SURVEY §2.4). `GROUP BY fid` is the per-file-stats query — headers
    * answer it with zero data IO.
    */
  private def computeAggregation(agg: Aggregation): Option[(StructType, Array[Array[Any]])] = {
    // header totals answer the UNFILTERED table only; once a record-level
    // filter is pushed the counts no longer describe the scan's output
    if (recordFilters.nonEmpty) return None
    // likewise a declared copc.maxlevel preview reads a SUBSET of each
    // file's chunks — header counts/extents describe the full file
    if (CopcPrune.maxLevelOption(options) >= 0) return None
    if (kind == FormatKind.Xyz) return None // no header to answer from
    if (resolved.sections.isEmpty) return None
    val groupByFid = agg.groupByExpressions.toSeq match {
      case Seq() => false
      case Seq(e) if fieldName(e).contains(PointCloudUtil.FidCol) => true
      case _ => return None
    }
    // per-group section lists: one group per fid, or all sections at once.
    // A fid whose sections hold zero records contributes NO group — SQL
    // aggregation emits no row for a group with no input rows (the global
    // COUNT(*) = 0 row, by contrast, is correct).
    val groups: Seq[(Option[Int], Seq[SectionWithFid])] =
      if (groupByFid)
        resolved.sections.groupBy(_.fid).toSeq.sortBy(_._1)
          .filter { case (_, ss) => ss.exists(_.section.count > 0) }
          .map { case (fid, ss) => (Some(fid), ss) }
      else Seq((None, resolved.sections))
    if (groupByFid && groups.isEmpty) return None

    def minMax(sections: Seq[SectionWithFid], col: String,
        wantMin: Boolean): Option[Any] = kind match {
      case FormatKind.Las =>
        val axis = col match {
          case "x" => 0; case "y" => 1; case "z" => 2; case _ => -1
        }
        if (axis < 0) return None
        // per-section raw values from LAS header pmin/pmax + scale/offset;
        // zero-count sections carry no meaningful bbox
        val nonEmpty = sections.filter(_.section.count > 0)
        val las = nonEmpty.flatMap(_.lasStats)
        if (las.isEmpty || las.size < nonEmpty.size) return None
        val raws = las.map { st =>
          val p = if (wantMin) st.pMin(axis) else st.pMax(axis)
          Math.round((p - st.offset(axis)) / st.scale(axis))
        }
        val v = if (wantMin) raws.min else raws.max
        if (v < Int.MinValue || v > Int.MaxValue) None else Some(v.toInt)
      case _ => None
    }

    val outFields = Vector.newBuilder[StructField]
    if (groupByFid) outFields += StructField(PointCloudUtil.FidCol, IntegerType, nullable = false)
    var first = true
    val rows = groups.map { case (fid, sections) =>
      val values = Vector.newBuilder[Any]
      fid.foreach(values += _)
      agg.aggregateExpressions.foreach { f: AggregateFunc =>
        f match {
          case _: CountStar =>
            if (first) outFields += StructField("count", LongType, nullable = false)
            values += sections.map(_.section.count).sum
          case m: Min =>
            val col = fieldName(m.column)
            val v = col.flatMap(minMax(sections, _, wantMin = true)).getOrElse(return None)
            if (first) outFields += StructField("min", IntegerType, nullable = true)
            values += v
          case m: Max =>
            val col = fieldName(m.column)
            val v = col.flatMap(minMax(sections, _, wantMin = false)).getOrElse(return None)
            if (first) outFields += StructField("max", IntegerType, nullable = true)
            values += v
          case _ => return None
        }
      }
      first = false
      values.result().toArray
    }
    Some((StructType(outFields.result()), rows.toArray))
  }

  private def fieldName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
      case _ => None
    }

  override def build(): Scan = pushedAggRow match {
    case Some((schema, values)) => new HeaderAggScan(schema, values)
    case None =>
      val pruned =
        if (skipFilters.isEmpty) resolved
        else resolved.copy(sections =
          resolved.sections.filter(sectionMayMatch(_, skipFilters)))
      new PointCloudScan(kind, pruned, readSchema, tableSchema, options, provider,
        recordFilters, limit, skipFilters)
  }
}

/** Conservative can-this-section-match check in the raw-int domain:
  * LAS header bbox bounds x/y/z; fid is a per-section constant; pid
  * spans [0, count). Returns false only when provably empty — shared by
  * the builder's planning-time skip and the scan's runtime (join-driven)
  * skip. */
private[connector] object SectionSkip {
  def mayMatch(sf: SectionWithFid, filters: Array[SourceFilter]): Boolean = {
    if (sf.section.count == 0) return true // degenerate; keep (costs nothing)
    def axisRange(col: String): Option[(Double, Double)] = col match {
      case PointCloudUtil.FidCol => Some((sf.fid.toDouble, sf.fid.toDouble))
      case PointCloudUtil.PidCol => Some((0.0, (sf.section.count - 1).toDouble))
      case "x" | "y" | "z" => sf.lasStats.map { st =>
        val a = col match { case "x" => 0; case "y" => 1; case _ => 2 }
        (Math.round((st.pMin(a) - st.offset(a)) / st.scale(a)).toDouble,
          Math.round((st.pMax(a) - st.offset(a)) / st.scale(a)).toDouble)
      }
      // temporal file skip: COPC's info VLR carries the file's gpstime
      // span (world-domain doubles, same domain as the exposed `time`
      // column) — a time-sliced read of a lidar lake skips whole files
      // here, before any split is cut, exactly like the bbox skip above
      case "time" => sf.laz.flatMap(lz => Option(lz.gpsRange))
        .map(r => (r(0), r(1)))
      case _ => None
    }
    def num(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue())
      case _ => None
    }
    def one(f: SourceFilter): Boolean = f match {
      case FGt(c, v)  => (axisRange(c), num(v)) match {
        case (Some((_, hi)), Some(x)) => hi > x;  case _ => true }
      case FGe(c, v)  => (axisRange(c), num(v)) match {
        case (Some((_, hi)), Some(x)) => hi >= x; case _ => true }
      case FLt(c, v)  => (axisRange(c), num(v)) match {
        case (Some((lo, _)), Some(x)) => lo < x;  case _ => true }
      case FLe(c, v)  => (axisRange(c), num(v)) match {
        case (Some((lo, _)), Some(x)) => lo <= x; case _ => true }
      case FEq(c, v)  => (axisRange(c), num(v)) match {
        case (Some((lo, hi)), Some(x)) => lo <= x && x <= hi; case _ => true }
      case FIn(c, vs) => axisRange(c) match {
        // runtime join filters arrive as In(fid, matched values)
        case Some((lo, hi)) =>
          vs.exists(v => num(v).forall(x => lo <= x && x <= hi))
        case None => true }
      case FAnd(l, r) => one(l) && one(r)
      case FOr(l, r)  => one(l) || one(r)
      case _ => true
    }
    filters.forall(one)
  }
}

/** Leaf scan returning precomputed rows — the pushed-aggregate result
  * (one row globally, or one per fid under GROUP BY fid). Zero executor
  * IO, mirroring the reference's driver-local CountPlan / AggregatePlan
  * (ExtraStrategies.scala:35-76). */
class HeaderAggScan(schema: StructType, rows: Array[Array[Any]]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = "graft header-aggregate scan (no data IO)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(HeaderAggPartition(rows))
  override def createReaderFactory(): PartitionReaderFactory = HeaderAggReaderFactory
}

case class HeaderAggPartition(rows: Array[Array[Any]]) extends InputPartition

object HeaderAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[HeaderAggPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = new GenericInternalRow(rows(i))
      override def close(): Unit = ()
    }
  }
}

/** Data scan: record-aligned partitions over every section. */
class PointCloudScan(
    kind: FormatKind,
    resolved: ResolvedPointCloud,
    schema: StructType,
    tableSchema: StructType,
    options: CaseInsensitiveStringMap,
    provider: PointCloudProvider = null,
    pushedFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    limit: Int = -1,
    /** ALL pushed-down conjuncts, claimed or residual — LAZ sections
      * keep record filters residual (Spark re-evaluates them exactly),
      * but the PLANNER may still use every conjunct conservatively for
      * COPC chunk skipping, exactly like the header file skip does. */
    planFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
  extends Scan with Batch with SupportsReportStatistics with SupportsRuntimeFiltering {

  /** `copc.maxlevel`, parsed ONCE at scan construction so a malformed
    * value fails the query instead of degrading; and a declared preview
    * over a source that cannot honor it (any non-COPC file) is rejected
    * outright — the [[BboxOption]] precedent: a silently over-delivering
    * subscription (the FULL corpus where ~1/8 was declared) is worse
    * than an error. */
  private val copcMaxLevel: Int = CopcPrune.maxLevelOption(options)
  if (copcMaxLevel >= 0) resolved.sections.foreach { sf =>
    // a zero-record section honors any preview trivially (empty task
    // files are normal in a multi-task layout)
    require(sf.section.count == 0 || sf.laz.exists(_.chunkLevels != null),
      s"copc.maxLevel declared but ${sf.section.location} carries no COPC " +
        "octree index, so the coarse preview cannot be honored there; " +
        "read it without the option instead")
  }

  /** Sections surviving runtime (join-driven) filtering; starts as the
    * planning-time set. */
  @volatile private var sections: Seq[SectionWithFid] = resolved.sections

  /** Runtime file skip: when this scan sits under a join on `fid`,
    * Spark's dynamic pruning sends the matched build-side values as an
    * In-filter and only the named files' sections are read — the DSv2
    * analogue of dynamic partition pruning, with the file as the
    * partition. */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // only declarable when fid survives column pruning — Spark resolves
    // these against the scan output and fails on a pruned column
    if (kind != FormatKind.Xyz && schema.fieldNames.contains(PointCloudUtil.FidCol))
      Array(org.apache.spark.sql.connector.expressions.Expressions.column(PointCloudUtil.FidCol))
    else Array.empty

  override def filter(filters: Array[SourceFilter]): Unit = {
    sections = sections.filter(SectionSkip.mayMatch(_, filters))
  }

  /** Streaming ingest: new files in the directory become micro-batches
    * (SURVEY §7.7). Binary formats split record-aligned; XYZ text (no
    * header count) streams one partition per file, like the batch path. */
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(provider != null, "streaming requires the owning provider")
    // filters claimed as pushed MUST be applied by the streaming readers
    // too — this scan (with its pushedFilters) is what Spark plans from;
    // the full conjunct set rides along for COPC planning-time pruning
    new PointCloudMicroBatchStream(kind, provider, schema, tableSchema, options,
      checkpointLocation, pushedFilters, planFilters)
  }

  /** Header-derived stats (exact row counts, on-disk bytes) so Catalyst
    * sizes joins correctly — a small LAS/PLY table becomes broadcastable
    * instead of defaulting to "unknown = huge". XYZ (no header count)
    * reports nothing. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val known = kind != FormatKind.Xyz && resolved.sections.nonEmpty
    private val fullRows = resolved.sections.map(_.section.count).sum
    // a copc.maxlevel preview plans only the coarse-level chunks, so the
    // planner-visible row count must be the KEPT chunk points (~1/8 per
    // skipped level), not the header total — otherwise Catalyst sizes
    // the cheap preview as the full corpus and misses broadcasts
    private val totalRows =
      if (copcMaxLevel < 0) fullRows
      else resolved.sections.map { sf =>
        // a zero-count section may carry no laz layout at all (an empty
        // uncompressed task file in the directory — admitted by the
        // construction require above); it contributes 0 rows, it must
        // not crash stats estimation
        sf.laz.fold(0L) { lz =>
          (0 until lz.numChunks).iterator
            .filter(i => lz.chunkLevels(i) < 0 || lz.chunkLevels(i) <= copcMaxLevel)
            .map(lz.chunkPoints(_)).sum
        }
      }.sum
    private val rows =
      if (limit >= 0) math.min(limit.toLong, totalRows) else totalRows
    override def sizeInBytes(): java.util.OptionalLong =
      if (known) {
        val bytes = resolved.sections.map(_.section.byteSize).sum
        // a pushed limit or level preview caps the scan output
        // proportionally
        val capped = if (fullRows > 0 && rows < fullRows)
          math.max(1L, bytes / fullRows * rows) else bytes
        java.util.OptionalLong.of(capped)
      } else java.util.OptionalLong.empty()
    override def numRows(): java.util.OptionalLong =
      if (known) java.util.OptionalLong.of(rows)
      else java.util.OptionalLong.empty()
  }

  /** XYZ token layout = the full (possibly user-supplied) table schema
    * minus the generated id columns — positions in the text line, which
    * pruning must not disturb. */
  private def xyzTokenSchema: StructType =
    StructType(tableSchema.fields.filterNot(f =>
      f.name == PointCloudUtil.FidCol || f.name == PointCloudUtil.PidCol))

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft ${kind.name} scan, ${resolved.sections.size} section(s), " +
      s"columns [${schema.fieldNames.mkString(",")}]" +
      (if (pushedFilters.nonEmpty) s", PushedFilters: [${pushedFilters.mkString(", ")}]" else "") +
      (if (limit >= 0) s", PushedLimit: $limit" else "") +
      (if (copcMaxLevel >= 0) s", PushedMaxLevel: $copcMaxLevel" else "")

  /** Split each section into runs of whole records sized by
    * `spark.sql.files.maxPartitionBytes` (replaces the reference's
    * Hadoop-InputFormat split alignment, FixedLengthBinarySection
    * InputFormat.scala:81-92). XYZ text sections (unknown count) get one
    * partition per file. */
  override def planInputPartitions(): Array[InputPartition] = {
    val maxBytes = SQLConf.get.filesMaxPartitionBytes
    // one rendered schema string per SECTION, shared by all its splits:
    // StructType.json allocates a fresh String per call, and distinct
    // instances defeat Java serialization's identity-based back-refs, so
    // a task that carries many splits (coalesce/union) would otherwise
    // serialize one full copy per split (observed as >1 MiB tasks)
    val xyzSchemaJson = if (kind == FormatKind.Xyz) xyzTokenSchema.json else null
    val all: Array[InputPartition] = sections.flatMap { sf =>
      val s = sf.section
      if (kind == FormatKind.Xyz) {
        Seq(XyzPartition(s.location, sf.fid, xyzSchemaJson))
      } else sf.laz match {
        case Some(lz) =>
          // COPC chunk skipping: octree bounds vs the pushed x/y/z box
          // (exactness preserved by the record predicate on whatever
          // still decodes) + the declared copc.maxlevel preview bound
          LazPlanning.partitions(s, sf.fid, lz, maxBytes,
            CopcPrune.keepMask(lz, planFilters, copcMaxLevel))
        case None =>
          val perPartition = math.max(1L, maxBytes / math.max(1, s.stride))
          val schemaJson = s.schema.json
          (0L until s.count by perPartition).map { start =>
            val n = math.min(perPartition, s.count - start)
            BinaryPartition(s.location, s.offset, start, n, s.stride,
              s.littleEndian, sf.fid, schemaJson)
          }
      }
    }.toArray
    if (limit < 0) all
    else {
      // pushed limit (only without pushed filters): keep the leading
      // partitions covering exactly `limit` records — LIMIT 10 over a
      // thousand files plans one partition of 10 records, not a scan
      var remaining = limit.toLong
      all.iterator.takeWhile(_ => remaining > 0).map {
        case b: BinaryPartition =>
          val take = math.min(b.numRecords, remaining)
          remaining -= take
          b.copy(numRecords = take)
        case lp: LazPartition =>
          val take = math.min(lp.numRecords, remaining)
          remaining -= take
          lp.truncatedTo(take)
        case other => other
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PointCloudReaderFactory(schema.json, tableSchema.json, pushedFilters)
}

/** A run of whole records inside one section. The section schema rides
  * along as JSON so the executor can rebuild decode offsets without any
  * shared mutable configuration (the reference's shared-conf race,
  * BinarySectionRelation.scala:151-155, is structurally impossible here).
  */
case class BinaryPartition(
    location: String,
    sectionOffset: Long,
    startRecord: Long,
    numRecords: Long,
    stride: Int,
    littleEndian: Boolean,
    fid: Int,
    sectionSchemaJson: String) extends InputPartition

case class XyzPartition(location: String, fid: Int, schemaJson: String)
  extends InputPartition

/** A run of whole LAZ chunks of one compressed file — the chunk is the
  * smallest independently decodable unit (all codec state resets at a
  * chunk boundary), so it plays the role whole records play for raw
  * sections: partitions are CHUNK-aligned, sized by compressed bytes
  * against maxPartitionBytes, and a 100-TB .laz corpus fans out across
  * executors exactly like its uncompressed twin. `chunkCounts` carries
  * decoded points per chunk (the last may be truncated by a pushed
  * limit — decode simply stops early mid-chunk). */
case class LazPartition(
    location: String,
    fid: Int,
    format: Byte,
    stride: Int,
    startRecord: Long,
    chunkOffsets: Array[Long],
    chunkBytes: Array[Long],
    chunkCounts: Array[Long],
    sectionSchemaJson: String) extends InputPartition {

  def numRecords: Long = chunkCounts.sum

  /** Leading chunks covering exactly `take` records (pushed limit). */
  def truncatedTo(take: Long): LazPartition = {
    var remaining = take
    var n = 0
    while (n < chunkCounts.length && remaining > 0) {
      remaining -= math.min(chunkCounts(n), remaining)
      n += 1
    }
    val counts = chunkCounts.take(n)
    if (n > 0) {
      val covered = counts.init.sum
      counts(n - 1) = math.min(counts(n - 1), take - covered)
    }
    copy(chunkOffsets = chunkOffsets.take(n), chunkBytes = chunkBytes.take(n),
      chunkCounts = counts)
  }
}

/** Explicit spatial subscription: the `bbox` read option,
  * `"xlo,xhi,ylo,yhi,zlo,zhi"` in the exposed-schema coordinate domain
  * (raw integers for LAS, stored values for PLY; `*` leaves a side
  * unbounded). Spark's DSv2 STREAMING planner never pushes predicates
  * into a micro-batch source (the stream's scan is built before the
  * optimizer sees any WHERE), so a consumer that should only ingest a
  * region must DECLARE it — the same way a Kafka reader declares its
  * subscription. The declared box is EXACT at the record level: it
  * compiles to the same [[RecordPredicate]] the claimed-pushdown path
  * uses (readers skip non-matching records before decode; LAZ readers
  * apply it to decoded chunk records), and at planning time it drives
  * header file-skip and COPC chunk pruning. The batch scan honors the
  * option identically, so one option value means one result set in
  * both modes. XYZ is rejected (text records have no reader-side
  * predicate surface — a silently over-delivering subscription would
  * be worse than an error). */
private[graft] object BboxOption {
  def filters(kind: FormatKind, tableSchema: StructType,
      options: CaseInsensitiveStringMap): Array[SourceFilter] =
    Option(options.get("bbox")) match {
      case None => Array.empty
      case Some(raw) =>
        require(kind != FormatKind.Xyz,
          "bbox is not supported for xyz sources: text records have no " +
            "reader-side predicate surface, so the declared box could not " +
            "be honored exactly")
        val parts = raw.split(",", -1).map(_.trim)
        require(parts.length == 6,
          s"bbox must be 'xlo,xhi,ylo,yhi,zlo,zhi' (exposed-schema " +
            s"coordinate domain, '*' for an unbounded side), got '$raw'")
        val dims = Array("x", "y", "z")
        val out = Array.newBuilder[SourceFilter]
        var a = 0
        while (a < 3) {
          // integer bounds stay integral (the raw-int LAS domain feeds
          // COPC box narrowing, which only reads integral literals);
          // fractional bounds parse as doubles for float PLY coords
          def bound(tok: String, side: String): Option[Any] =
            if (tok == "*") None
            else Some(
              try java.lang.Long.valueOf(tok.toLong)
              catch {
                case _: NumberFormatException =>
                  val d = try tok.toDouble catch {
                    case _: NumberFormatException =>
                      throw new IllegalArgumentException(
                        s"bbox $side bound for ${dims(a)} is not a number: '$tok'")
                  }
                  // NaN/Infinity parse as doubles but make every
                  // comparison false — a subscription that silently
                  // matches nothing, the exact failure mode this option
                  // exists to surface as an error
                  require(java.lang.Double.isFinite(d),
                    s"bbox $side bound for ${dims(a)} is not finite: '$tok'")
                  java.lang.Double.valueOf(d)
              })
          val lo = bound(parts(2 * a), "lower")
          val hi = bound(parts(2 * a + 1), "upper")
          for (l <- lo; h <- hi) {
            // exact in the Long domain (a double round-trip would wave
            // through inverted bounds past 2^53); mixed types compare
            // via BigDecimal, exact for both
            val inverted = (l, h) match {
              case (a1: java.lang.Long, b1: java.lang.Long) => a1 > b1
              case _ =>
                def big(v: Any) = v match {
                  case x: java.lang.Long => BigDecimal(x.longValue)
                  case x: java.lang.Double => BigDecimal(x.doubleValue)
                }
                big(l) > big(h)
            }
            require(!inverted, s"bbox ${dims(a)} bounds are inverted: $l > $h")
          }
          lo.foreach(v => out += FGe(dims(a), v))
          hi.foreach(v => out += FLe(dims(a), v))
          a += 1
        }
        val fs = out.result()
        fs.foreach { f =>
          require(RecordPredicate.pushable(f, tableSchema),
            s"bbox bound $f is not evaluable against this table's schema " +
              "(x/y/z must exist as numeric primitive columns)")
        }
        fs
    }
}

/** Explicit TEMPORAL subscription: the `timerange` read option,
  * `"lo,hi"` in the exposed `time` (gpstime) domain, `*` for an
  * unbounded side — the temporal twin of [[BboxOption]] and, like it,
  * THE pushdown channel for streaming reads (Spark never pushes
  * predicates into a micro-batch source; a batch `WHERE time BETWEEN`
  * gets the same planning effects automatically — pc31). The declared
  * range is EXACT at the record level (same [[RecordPredicate]] path),
  * and at planning it drives the COPC gps-range whole-file skip
  * ([[SectionSkip]] reading `LazInfo.gpsRange`). Rejected when the
  * table has no pushable `time` column — a silently over-delivering
  * subscription is worse than an error (the bbox precedent). */
private[graft] object TimeRangeOption {
  def filters(kind: FormatKind, tableSchema: StructType,
      options: CaseInsensitiveStringMap): Array[SourceFilter] =
    Option(options.get("timerange")) match {
      case None => Array.empty
      case Some(raw) =>
        require(kind != FormatKind.Xyz,
          "timerange is not supported for xyz sources: text records have " +
            "no reader-side predicate surface, so the declared range could " +
            "not be honored exactly")
        val parts = raw.split(",", -1).map(_.trim)
        require(parts.length == 2,
          s"timerange must be 'lo,hi' (gpstime domain, '*' for an " +
            s"unbounded side), got '$raw'")
        def bound(tok: String, side: String): Option[Double] =
          if (tok == "*") None
          else {
            val d = try tok.toDouble catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"timerange $side bound is not a number: '$tok'")
            }
            // NaN parses but never compares true — a subscription that
            // silently matches nothing must be an error
            require(java.lang.Double.isFinite(d),
              s"timerange $side bound is not finite: '$tok'")
            Some(d)
          }
        val lo = bound(parts(0), "lower")
        val hi = bound(parts(1), "upper")
        require(lo.nonEmpty || hi.nonEmpty,
          s"timerange '$raw' binds nothing; drop the option instead")
        for (l <- lo; h <- hi)
          require(l <= h, s"timerange bounds are inverted: $l > $h")
        val fs: Array[SourceFilter] =
          (lo.map(v => FGe("time", java.lang.Double.valueOf(v))).toSeq ++
            hi.map(v => FLe("time", java.lang.Double.valueOf(v)))).toArray
        fs.foreach { f =>
          require(RecordPredicate.pushable(f, tableSchema),
            s"timerange bound $f is not evaluable against this table's " +
              "schema (a numeric 'time' column must exist)")
        }
        fs
    }
}

/** Chunk-level spatial pruning over a COPC file's octree bounds: the
  * planner drops whole LAZ chunks whose node cube cannot intersect the
  * pushed x/y/z box — row-group-stats pruning for point clouds, decided
  * on the driver before any split is cut. One level below
  * [[SectionSkip]] (whole-file skip on header bounds), one level above
  * [[RecordPredicate]] (exact per-record evaluation on decoded bytes);
  * all three see the same pushed conjuncts, so a chunk survives pruning
  * iff its bounds admit at least one possibly-matching record. */
private[graft] object CopcPrune {

  /** Per-dim raw intervals [xlo,xhi,ylo,yhi,zlo,zhi] implied by the
    * pushed conjuncts, or null when no x/y/z bound exists. Only
    * top-level conjuncts (and nested Ands) narrow; Or and non-numeric
    * shapes are ignored — conservative by construction. */
  def queryBox(filters: Array[SourceFilter]): Array[Long] = {
    val box = Array(Long.MinValue, Long.MaxValue, Long.MinValue, Long.MaxValue,
      Long.MinValue, Long.MaxValue)
    var any = false
    def dim(c: String): Int = c match {
      case "x" => 0; case "y" => 1; case "z" => 2; case _ => -1
    }
    def num(v: Any): Option[Long] = v match {
      case n: java.lang.Integer => Some(n.longValue)
      case n: java.lang.Long => Some(n.longValue)
      case n: java.lang.Short => Some(n.longValue)
      case n: java.lang.Byte => Some(n.longValue)
      case _ => None
    }
    def lo(d: Int, v: Long): Unit = { box(2 * d) = math.max(box(2 * d), v); any = true }
    def hi(d: Int, v: Long): Unit = { box(2 * d + 1) = math.min(box(2 * d + 1), v); any = true }
    def one(f: SourceFilter): Unit = f match {
      case FGt(c, v) if dim(c) >= 0 => num(v).foreach(x => lo(dim(c), x + 1))
      case FGe(c, v) if dim(c) >= 0 => num(v).foreach(x => lo(dim(c), x))
      case FLt(c, v) if dim(c) >= 0 => num(v).foreach(x => hi(dim(c), x - 1))
      case FLe(c, v) if dim(c) >= 0 => num(v).foreach(x => hi(dim(c), x))
      case FEq(c, v) if dim(c) >= 0 => num(v).foreach { x => lo(dim(c), x); hi(dim(c), x) }
      case FIn(c, vs) if dim(c) >= 0 && vs.nonEmpty =>
        val xs = vs.flatMap(num(_))
        if (xs.length == vs.length) { lo(dim(c), xs.min); hi(dim(c), xs.max) }
      case FAnd(l, r) => one(l); one(r)
      case _ => // Or / unknown: no narrowing
    }
    filters.foreach(one)
    if (any) box else null
  }

  /** Keep mask over `lz`'s chunks, or null when pruning cannot apply
    * (no bounds in the file, or no x/y/z constraint in the query).
    * Chunks without bounds are always kept. */
  def keepMask(lz: graft.pointcloud.las.laz.LazInfo,
      filters: Array[SourceFilter]): Array[Boolean] = {
    if (lz.chunkRawBounds == null) return null
    val box = queryBox(filters)
    if (box == null) return null
    Array.tabulate(lz.numChunks) { i =>
      val b = lz.chunkRawBounds(i)
      b == null ||
        (b(1) >= box(0) && b(0) <= box(1) &&
          b(3) >= box(2) && b(2) <= box(3) &&
          b(5) >= box(4) && b(4) <= box(5))
    }
  }

  /** [[keepMask]] combined with the `copc.maxlevel` coarse-preview
    * bound (−1 = unset): over an LOD layout, keep only chunks whose
    * octree node sits at level ≤ maxLevel. Unlike the bbox mask this
    * CHANGES the result set (a declared approximate read), so it is
    * only ever driven by the explicit read option. Chunks without a
    * hierarchy entry (level −1) are kept — the option bounds octree
    * NODES, and data outside the octree contract must not silently
    * vanish. */
  def keepMask(lz: graft.pointcloud.las.laz.LazInfo,
      filters: Array[SourceFilter], maxLevel: Int): Array[Boolean] = {
    val boxKeep = keepMask(lz, filters)
    if (maxLevel < 0 || lz.chunkLevels == null) return boxKeep
    Array.tabulate(lz.numChunks) { i =>
      (boxKeep == null || boxKeep(i)) &&
        (lz.chunkLevels(i) < 0 || lz.chunkLevels(i) <= maxLevel)
    }
  }

  /** The `copc.maxlevel` read option (−1 when absent): the LOD
    * preview's declared depth bound. */
  def maxLevelOption(options: CaseInsensitiveStringMap): Int =
    Option(options.get("copc.maxlevel")) match {
      case None => -1
      case Some(s) =>
        val v = try s.trim.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"copc.maxLevel '$s' is not an integer")
        }
        require(v >= 0, s"copc.maxLevel must be >= 0, got $v")
        v
    }
}

/** Shared LAZ split planning (batch scan + streaming source). A `keep`
  * mask (from [[CopcPrune]]) drops pruned chunks at planning: each
  * maximal CONSECUTIVE kept run becomes its own partition group with
  * its true record base, so `pid` stays the record's absolute index in
  * the file across pruning gaps and the chunk-seeking readers run
  * unchanged. */
private[graft] object LazPlanning {
  def partitions(s: graft.pointcloud.Section, fid: Int,
      lz: graft.pointcloud.las.laz.LazInfo, maxBytes: Long,
      keep: Array[Boolean] = null): Seq[LazPartition] = {
    val schemaJson = s.schema.json
    val out = Seq.newBuilder[LazPartition]
    var i = 0
    var off = lz.firstChunkOffset
    var recBase = 0L // records preceding chunk i (pid continuity)
    while (i < lz.numChunks) {
      if (keep != null && !keep(i)) {
        off += lz.chunkBytes(i)
        recBase += lz.chunkPoints(i)
        i += 1
      } else {
      val first = i
      val firstOff = off
      val firstRec = recBase
      var bytes = 0L
      while (i < lz.numChunks && (keep == null || keep(i)) &&
          (i == first || bytes + lz.chunkBytes(i) <= maxBytes)) {
        bytes += lz.chunkBytes(i)
        off += lz.chunkBytes(i)
        recBase += lz.chunkPoints(i)
        i += 1
      }
      val offs = new Array[Long](i - first)
      val bts = new Array[Long](i - first)
      val cnts = new Array[Long](i - first)
      var k = first
      var o = firstOff
      while (k < i) {
        offs(k - first) = o
        bts(k - first) = lz.chunkBytes(k)
        cnts(k - first) = lz.chunkPoints(k)
        o += lz.chunkBytes(k)
        k += 1
      }
      out += LazPartition(s.location, fid, lz.format, lz.stride,
        firstRec, offs, bts, cnts, schemaJson)
      }
    }
    out.result()
  }
}

class PointCloudReaderFactory(
    readSchemaJson: String,
    tableSchemaJson: String = null,
    pushedFilters: Array[SourceFilter] = Array.empty)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val readSchema = DataType.fromJson(readSchemaJson).asInstanceOf[StructType]
    partition match {
      case p: BinaryPartition => new BinarySectionReader(p, readSchema, predicate(p))
      case p: LazPartition => new LazSectionReader(p, readSchema, lazPredicate(p))
      case p: XyzPartition => new XyzReader(p, readSchema)
    }
  }

  /** Fixed-stride binary sections decode vectorized (ColumnarBatch) —
    * raw and LAZ alike (a decoded chunk IS a run of fixed-stride
    * records); XYZ text stays row-oriented. */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    partition.isInstanceOf[BinaryPartition] || partition.isInstanceOf[LazPartition]

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val readSchema = DataType.fromJson(readSchemaJson).asInstanceOf[StructType]
    partition match {
      case p: BinaryPartition => new BinarySectionColumnarReader(p, readSchema, predicate(p))
      case p: LazPartition => new LazSectionColumnarReader(p, readSchema, lazPredicate(p))
    }
  }

  /** Pushed-filter evaluator compiled against this partition's section
    * schema (sections differ across merged files); null when nothing was
    * pushed. */
  private def predicate(p: BinaryPartition): RecordPredicate =
    if (pushedFilters.isEmpty) null
    else new RecordPredicate(pushedFilters,
      DataType.fromJson(tableSchemaJson).asInstanceOf[StructType],
      Section(p.location, p.sectionOffset, p.numRecords, p.littleEndian,
        DataType.fromJson(p.sectionSchemaJson).asInstanceOf[StructType], p.stride),
      p.fid)

  /** Same, over a LAZ partition's DECODED records (a decoded chunk is a
    * run of ordinary fixed-stride LAS records). The batch builder keeps
    * filters residual for compressed tables, but the STREAMING path may
    * claim filters as pushed before any .laz file lands — the readers
    * must honor them or claimed-pushed rows leak unfiltered. */
  private def lazPredicate(p: LazPartition): RecordPredicate =
    if (pushedFilters.isEmpty) null
    else new RecordPredicate(pushedFilters,
      DataType.fromJson(tableSchemaJson).asInstanceOf[StructType],
      Section(p.location, 0, p.numRecords, littleEndian = true,
        DataType.fromJson(p.sectionSchemaJson).asInstanceOf[StructType], p.stride),
      p.fid)
}

/** Streams one partition's records through a reused chunk buffer and
  * decodes them into a reused row — no per-record allocation. Pushed
  * filters are evaluated on the raw record bytes; non-matching records
  * are skipped before any decode. */
class BinarySectionReader(p: BinaryPartition, readSchema: StructType,
    predicate: RecordPredicate = null)
  extends PartitionReader[InternalRow] {

  private val sectionSchema = DataType.fromJson(p.sectionSchemaJson).asInstanceOf[StructType]
  private val section = Section(p.location, p.sectionOffset, p.numRecords,
    p.littleEndian, sectionSchema, p.stride)
  private val decoder = new RecordDecoder(section, readSchema, p.fid)

  private val path = new Path(p.location)
  private val in = path.getFileSystem(LocalIo.conf).open(path)
  in.seek(p.sectionOffset + p.startRecord * p.stride)

  // chunked reads: ~4 MiB of whole records at a time
  private val recordsPerChunk: Int =
    math.max(1, math.min(p.numRecords, (4 << 20) / math.max(1, p.stride)).toInt)
  private val chunk = new Array[Byte](recordsPerChunk * p.stride)
  private val buf = ByteBuffer.wrap(chunk).order(section.order)

  private var nextIdx = 0L          // next record index within this partition
  private var chunkStart = 0L       // partition-record index of chunk[0]
  private var chunkLen = 0          // records currently in chunk
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (true) {
      if (nextIdx >= p.numRecords) return false
      if (nextIdx - chunkStart >= chunkLen) {
        val n = math.min(recordsPerChunk.toLong, p.numRecords - nextIdx).toInt
        in.readFully(chunk, 0, n * p.stride)
        chunkStart = nextIdx
        chunkLen = n
      }
      val base = ((nextIdx - chunkStart) * p.stride).toInt
      val pid = p.startRecord + nextIdx
      nextIdx += 1
      if (predicate == null || predicate.matches(buf, base, pid)) {
        current = decoder.decode(buf, base, pid)
        return true
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

/** Decodes a run of LAZ chunks: each chunk's compressed bytes are read
  * whole (they are the IO unit the chunk table bounds), entropy-decoded
  * into raw LAS record bytes, and handed to the SAME RecordDecoder the
  * uncompressed reader uses — schema casts, fid/pid synthesis and column
  * pruning are shared, so a .laz scan differs from .las only in the
  * decode step. Sequential within a chunk by construction (prediction
  * state chains point to point); parallel ACROSS chunks/partitions. */
class LazSectionReader(p: LazPartition, readSchema: StructType,
    predicate: RecordPredicate = null)
  extends PartitionReader[InternalRow] {

  private val sectionSchema = DataType.fromJson(p.sectionSchemaJson).asInstanceOf[StructType]
  private val section = Section(p.location, 0, p.numRecords,
    littleEndian = true, sectionSchema, p.stride)
  private val decoder = new RecordDecoder(section, readSchema, p.fid)
  private val chunkDecoder = new graft.pointcloud.las.laz.LazChunkDecoder(p.format, p.stride)

  private val path = new Path(p.location)
  private val in = path.getFileSystem(LocalIo.conf).open(path)

  private var chunkIdx = -1
  private var buf: ByteBuffer = _
  private var idxInChunk = 0
  private var countInChunk = 0
  private var pid = p.startRecord - 1
  private var curBase = 0

  override def next(): Boolean = {
    while (true) {
      while (idxInChunk >= countInChunk) {
        chunkIdx += 1
        if (chunkIdx >= p.chunkOffsets.length) return false
        val count = p.chunkCounts(chunkIdx)
        if (count > 0) {
          val compressed = new Array[Byte](p.chunkBytes(chunkIdx).toInt)
          in.seek(p.chunkOffsets(chunkIdx))
          in.readFully(compressed)
          val records = chunkDecoder.decode(compressed, count.toInt)
          buf = ByteBuffer.wrap(records).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          idxInChunk = 0
          countInChunk = count.toInt
        }
      }
      curBase = idxInChunk * p.stride
      idxInChunk += 1
      pid += 1
      // filters claimed as pushed are honored on the DECODED record
      // bytes (the chunk must entropy-decode either way; what pushdown
      // saves here is row materialization, not decode work)
      if (predicate == null || predicate.matches(buf, curBase, pid)) return true
    }
    false // unreachable
  }

  override def get(): InternalRow = decoder.decode(buf, curBase, pid)

  override def close(): Unit = in.close()
}

/** Tab-separated text reader: types parsed per the schema, missing
  * trailing fields padded with null (xyz/XyzRelation.scala:57-70). */
class XyzReader(p: XyzPartition, readSchema: StructType)
  extends PartitionReader[InternalRow] {

  private val fileSchema = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
  private val path = new Path(p.location)
  private val reader = new BufferedReader(new InputStreamReader(
    path.getFileSystem(LocalIo.conf).open(path), "UTF-8"))

  private val row = new SpecificInternalRow(readSchema)
  // for each output field: source token index (or -1 for fid/pid/absent)
  private val plan: Array[(Int, DataType)] = readSchema.fields.map { f =>
    (fileSchema.fieldNames.indexOf(f.name), f.dataType)
  }
  private val fidOrd = readSchema.fieldNames.indexOf(PointCloudUtil.FidCol)
  private val pidOrd = readSchema.fieldNames.indexOf(PointCloudUtil.PidCol)

  private var pid = -1L
  private var line: String = _

  override def next(): Boolean = {
    line = reader.readLine()
    while (line != null && line.isEmpty) line = reader.readLine()
    pid += 1
    line != null
  }

  override def get(): InternalRow = {
    val tokens = line.split('\t')
    var i = 0
    while (i < plan.length) {
      val (src, dt) = plan(i)
      if (i == fidOrd) row.setInt(i, p.fid)
      else if (i == pidOrd) row.setLong(i, pid)
      else if (src < 0 || src >= tokens.length || tokens(src).isEmpty) row.setNullAt(i)
      else {
        val t = tokens(src)
        try dt match {
          case ByteType    => row.setByte(i, t.toByte)
          case ShortType   => row.setShort(i, t.toShort)
          case IntegerType => row.setInt(i, t.toInt)
          case LongType    => row.setLong(i, t.toLong)
          case FloatType   => row.setFloat(i, t.toFloat)
          case DoubleType  => row.setDouble(i, t.toDouble)
          case StringType  => row.update(i, UTF8String.fromString(t))
          case _           => row.setNullAt(i)
        } catch { case _: NumberFormatException => row.setNullAt(i) }
      }
      i += 1
    }
    row
  }

  override def close(): Unit = reader.close()
}
