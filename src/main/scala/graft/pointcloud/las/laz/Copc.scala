package graft.pointcloud.las.laz

import java.nio.{ByteBuffer, ByteOrder}

import graft.pointcloud.las.{LasExtraBytes, LasHeader}

/** Cloud-Optimized Point Cloud (COPC, the published copc.io layout):
  * a LAS 1.4 / layered-LAZ file whose chunks are octree nodes, indexed
  * by a `copc` info VLR (record 1) and an EPT-style hierarchy EVLR
  * (record 1000). The hierarchy gives every chunk a voxel cube, which
  * turns the record-level x/y/z predicate pushdown into CHUNK-LEVEL
  * skipping: a bbox query over a 100-TB corpus decodes only the octree
  * nodes its box intersects — the compressed analogue of parquet
  * row-group stats pruning, planned on the driver before any split is
  * cut. The reference has no compressed-format support at all
  * (FixedLengthBinarySectionInputFormat.scala:48-56); this module is
  * built from the public COPC specification.
  *
  * Trust model (same as parquet stats): the info VLR declares the cube
  * and every node entry its voxel; pruning believes them. Our writer
  * enforces the invariant (every point inside the declared cube —
  * [[graft.pointcloud.connector.PointCloudWrite]] rejects violations at
  * write time), and the reader converts node cubes to raw-integer
  * bounds with ±1-quantum slack so floating-point wobble at node
  * boundaries can never drop a matching record. A foreign file whose
  * points violate its own declared octree is malformed input, exactly
  * like a parquet file with lying row-group stats. */
object Copc {

  val VlrUserId = "copc"
  val InfoRecordId = 1
  val HierRecordId = 1000
  val InfoPayloadLen = 160
  val EntryLen = 32
  /** Octree depth bound: 3·level key bits must fit a Long (writer) and
    * 2^level a positive Int (reader cube math). */
  val MaxLevel = 20
  /** LOD layouts pack (level, voxel key) into one Long — 5 level bits
    * above 3·19 key bits — so their depth bound is one lower. */
  val MaxLodLevel = 19
  private val LodKeyBits = 57
  /** Hierarchy-size bound: foreign metadata is buffered whole on the
    * driver, so a file cannot declare an absurd page graph. */
  val MaxEntries = 1 << 22

  /** Writer-side twin of the reader's hierarchy bound ([[readDataEntries]]
    * caps the TOTAL entry count across all pages at [[MaxEntries]]): a
    * file whose hierarchy exceeds the cap would be REJECTED BY THIS
    * REPO'S OWN READER regardless of paging, so the writer must fail
    * the write with an actionable error instead of landing an
    * unreadable file (~4M chunks at the default cap). `bound` is the
    * spec hook — production callers use the default, and the spec pins
    * that the predicate trips at exactly the threshold the reader
    * enforces. Per-PAGE size is handled separately by
    * [[pagedHierarchyPayload]] (child pages past `copc.pageentries`). */
  def requireEntryBudget(entries: Long, location: String,
      bound: Int = MaxEntries): Unit =
    require(entries <= bound,
      s"$location: COPC hierarchy would carry $entries entries, past the " +
        s"$bound-entry reader bound; raise " +
        "copc.chunkcap / copc.nodepoints or lower copc.level so fewer " +
        "chunks are cut")

  /** The `copc` info VLR payload (public spec, 160 bytes). */
  case class Info(
      centerX: Double, centerY: Double, centerZ: Double,
      halfsize: Double, spacing: Double,
      rootHierOffset: Long, rootHierSize: Long,
      gpsMin: Double, gpsMax: Double)

  /** One hierarchy entry: voxel key + chunk location. `pointCount` −1
    * marks a child-page reference, 0 an empty node. */
  case class Entry(level: Int, x: Int, y: Int, z: Int,
      offset: Long, byteSize: Int, pointCount: Int)

  def infoPayload(info: Info): Array[Byte] = {
    val b = ByteBuffer.allocate(InfoPayloadLen).order(ByteOrder.LITTLE_ENDIAN)
    b.putDouble(info.centerX).putDouble(info.centerY).putDouble(info.centerZ)
    b.putDouble(info.halfsize).putDouble(info.spacing)
    b.putLong(info.rootHierOffset).putLong(info.rootHierSize)
    b.putDouble(info.gpsMin).putDouble(info.gpsMax)
    b.array() // reserved[11] stays zero
  }

  def parseInfo(payload: Array[Byte]): Info = {
    require(payload.length >= InfoPayloadLen,
      s"copc info VLR payload is ${payload.length} bytes (need $InfoPayloadLen)")
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    Info(b.getDouble(0), b.getDouble(8), b.getDouble(16), b.getDouble(24),
      b.getDouble(32), b.getLong(40), b.getLong(48), b.getDouble(56), b.getDouble(64))
  }

  def entriesPayload(entries: Seq[Entry]): Array[Byte] = {
    val b = ByteBuffer.allocate(entries.length * EntryLen).order(ByteOrder.LITTLE_ENDIAN)
    entries.foreach { e =>
      b.putInt(e.level).putInt(e.x).putInt(e.y).putInt(e.z)
      b.putLong(e.offset).putInt(e.byteSize).putInt(e.pointCount)
    }
    b.array()
  }

  def parseEntries(payload: Array[Byte]): Seq[Entry] = {
    require(payload.length % EntryLen == 0,
      s"hierarchy page of ${payload.length} bytes is not a whole number of entries")
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    (0 until payload.length / EntryLen).map { i =>
      val o = i * EntryLen
      Entry(b.getInt(o), b.getInt(o + 4), b.getInt(o + 8), b.getInt(o + 12),
        b.getLong(o + 16), b.getInt(o + 24), b.getInt(o + 28))
    }
  }

  /** 54-byte VLR container for the info record. */
  def infoVlrRecord(info: Info): Array[Byte] =
    vlrContainer(InfoRecordId, infoPayload(info))

  private def vlrContainer(recordId: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](54 + payload.length)
    val buf = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    val uid = VlrUserId.getBytes("US-ASCII")
    var j = 0
    while (j < uid.length) { buf.put(2 + j, uid(j)); j += 1 }
    buf.putShort(18, recordId.toShort)
    buf.putShort(20, payload.length.toShort)
    System.arraycopy(payload, 0, out, 54, payload.length)
    out
  }

  /** 60-byte EVLR container (64-bit length) for the hierarchy. */
  def hierEvlrRecord(payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](60 + payload.length)
    val buf = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    val uid = VlrUserId.getBytes("US-ASCII")
    var j = 0
    while (j < uid.length) { buf.put(2 + j, uid(j)); j += 1 }
    buf.putShort(18, HierRecordId.toShort)
    buf.putLong(20, payload.length.toLong)
    System.arraycopy(payload, 0, out, 60, payload.length)
    out
  }

  /** Walk the hierarchy page graph from the info VLR's root page.
    * Child pages (pointCount −1) are fetched through the same bounded
    * random-access reads the VLR walker uses; page count, entry count
    * and recursion depth are all capped so foreign metadata cannot blow
    * up the driver. Returns data entries only (pointCount > 0). */
  def readDataEntries(info: Info, readAt: LasExtraBytes.ReadAt,
      fileLen: Long): Seq[Entry] = {
    val out = Seq.newBuilder[Entry]
    var total = 0
    def page(off: Long, size: Long, depth: Int): Unit = {
      require(depth < 32, "copc hierarchy deeper than 32 pages")
      require(size >= 0 && size % EntryLen == 0 && size / EntryLen <= MaxEntries,
        s"copc hierarchy page of $size bytes outside the reader bound")
      require(off >= 0 && off + size <= fileLen,
        s"copc hierarchy page [$off, ${off + size}) outside the file (len $fileLen)")
      total += (size / EntryLen).toInt
      require(total <= MaxEntries, s"copc hierarchy exceeds $MaxEntries entries")
      parseEntries(readAt(off, size.toInt)).foreach { e =>
        if (e.pointCount == -1) page(e.offset, e.byteSize.toLong, depth + 1)
        else if (e.pointCount > 0) out += e
      }
    }
    page(info.rootHierOffset, info.rootHierSize, 0)
    out.result()
  }

  /** Per-chunk index derived from the hierarchy, aligned with `lz`'s
    * chunk order: raw-integer bounds [xlo,xhi,ylo,yhi,zlo,zhi] (null
    * rows for undescribed chunks — never pruned) and the octree LEVEL
    * of each chunk's node (−1 when unbound), which powers the
    * `copc.maxlevel` approximate-read option over LOD layouts. */
  case class ChunkIndex(bounds: Array[Array[Long]], levels: Array[Int])

  /** An entry binds to a chunk only when offset, byte size AND point
    * count all agree — a hierarchy that disagrees with the chunk table
    * silently yields no index (the file still reads as plain LAZ).
    * World→raw conversion widens each side by one raw quantum, so
    * boundary points assigned to a neighbouring node by fp rounding
    * still fall inside their chunk's bounds. */
  def chunkIndex(header: LasHeader, info: Info, entries: Seq[Entry],
      lz: LazInfo): ChunkIndex = {
    if (header.scale.exists(_ <= 0)) return null
    // an EMPTY COPC file (a task that received zero rows still writes a
    // valid container) carries an empty-but-present index: it is COPC,
    // it binds trivially, and a declared preview is honored by it —
    // only a NON-empty file whose hierarchy fails to bind degrades to
    // plain LAZ (null)
    if (lz.numChunks == 0) return ChunkIndex(Array.empty, Array.empty)
    val byOffset = entries.iterator.map(e => e.offset -> e).toMap
    val bounds = new Array[Array[Long]](lz.numChunks)
    val levels = Array.fill(lz.numChunks)(-1)
    var off = lz.firstChunkOffset
    var any = false
    var i = 0
    while (i < lz.numChunks) {
      byOffset.get(off) match {
        case Some(e) if e.byteSize.toLong == lz.chunkBytes(i) &&
            e.pointCount.toLong == lz.chunkPoints(i) &&
            e.level >= 0 && e.level <= MaxLevel &&
            inRange(e.x, e.level) && inRange(e.y, e.level) && inRange(e.z, e.level) =>
          val side = 2.0 * info.halfsize / (1L << e.level)
          val b = new Array[Long](6)
          fillDim(b, 0, info.centerX - info.halfsize + e.x * side, side,
            header.scale(0), header.offset(0))
          fillDim(b, 2, info.centerY - info.halfsize + e.y * side, side,
            header.scale(1), header.offset(1))
          fillDim(b, 4, info.centerZ - info.halfsize + e.z * side, side,
            header.scale(2), header.offset(2))
          bounds(i) = b
          levels(i) = e.level
          any = true
        case _ => // unmatched chunk: no bounds, never pruned
      }
      off += lz.chunkBytes(i)
      i += 1
    }
    if (any) ChunkIndex(bounds, levels) else null
  }

  private def inRange(idx: Int, level: Int): Boolean =
    idx >= 0 && idx < (1L << level)

  private def fillDim(b: Array[Long], at: Int, worldLo: Double, side: Double,
      scale: Double, offset: Double): Unit = {
    b(at) = math.floor((worldLo - offset) / scale).toLong - 1
    b(at + 1) = math.ceil((worldLo + side - offset) / scale).toLong + 1
  }

  /** The file's `copc` info VLR, if present (throws on a malformed
    * payload — the resolve path wraps the call and degrades to plain
    * LAZ itself, keeping the one parse it shares with the gpstime-range
    * overlay). */
  def readInfo(header: LasHeader, readAt: LasExtraBytes.ReadAt): Option[Info] =
    LasExtraBytes.findVlrPayloads(header, readAt, VlrUserId, InfoRecordId)
      .headOption.map(parseInfo)

  /** Resolve a compressed file's COPC metadata (info VLR already parsed
    * — the resolve path reads it once and shares it with the
    * gpstime-range overlay) into a per-chunk index (bounds + node
    * levels), or null when the hierarchy cannot be bound to the chunk
    * table. Degrades to null — never throws — because COPC metadata is
    * an OPTIMIZATION layer over a file that is already a fully
    * readable LAZ. */
  def indexForInfo(header: LasHeader, readAt: LasExtraBytes.ReadAt,
      fileLen: Long, lz: LazInfo, info: Info): ChunkIndex =
    try {
      require(info.halfsize > 0, s"copc cube halfsize ${info.halfsize} not positive")
      chunkIndex(header, info, readDataEntries(info, readAt, fileLen), lz)
    } catch { case _: Exception => null }

  /** Writer-side voxel index of a world coordinate along one dimension
    * (clamped only at the exact cube max; the writer rejects coordinates
    * outside the cube before calling this). */
  def voxelIdx(world: Double, cubeMin: Double, side: Double, level: Int): Int = {
    val n = 1 << level
    val i = math.floor((world - cubeMin) / side).toInt
    if (i < 0) 0 else if (i >= n) n - 1 else i
  }

  /** Packed voxel key (level fixed by the writer): 3·level bits. */
  def packKey(kx: Int, ky: Int, kz: Int, level: Int): Long =
    (((kx.toLong << level) + ky.toLong) << level) + kz.toLong

  /** Unpack a [[packKey]] back into (x, y, z). */
  def unpackKey(key: Long, level: Int): (Int, Int, Int) = {
    val mask = (1L << level) - 1
    (((key >> (2 * level)) & mask).toInt, ((key >> level) & mask).toInt, (key & mask).toInt)
  }

  /** Serialize a hierarchy (ancestors ++ leaves, writer order) into one
    * or more PAGES under a per-page entry budget, the published COPC
    * page graph: a page holding more than `pageBudget` entries keeps
    * its subtree-root-level entries and replaces each child subtree
    * with a child-page REFERENCE entry (pointCount −1, offset/byteSize
    * addressing the child page), recursively. Returns the full
    * payload (root page first, children preorder) and the ROOT page's
    * byte size — the info VLR declares the root page only; readers
    * (ours: [[readDataEntries]]) discover the rest through the
    * references. Why pages at all: a viewer streaming one region of a
    * huge file fetches the root + the pages along its descent path
    * instead of one monolithic multi-MiB root, and the per-page size
    * stays under any reader's page bound. `payloadStart` is the
    * absolute file offset the payload lands at (EVLR header end) —
    * reference offsets are absolute per the published layout. A
    * hierarchy within the budget serializes BYTE-IDENTICALLY to the
    * unpaged layout (one root page), so paging is invisible until a
    * writer opts in via `copc.pageentries` or overflows it.
    *
    * A subtree that cannot split further (several chunk entries
    * sharing ONE voxel key — the chunkcap-overflow encoding) emits one
    * oversized page rather than failing: the reader's per-page cap is
    * [[MaxEntries]], which [[requireEntryBudget]] already enforces for
    * the total. */
  def pagedHierarchyPayload(entries: Seq[Entry], pageBudget: Int,
      payloadStart: Long): (Array[Byte], Int) = {
    require(pageBudget > 0, s"page budget must be positive, got $pageBudget")
    if (entries.length <= pageBudget) {
      val p = entriesPayload(entries)
      return (p, p.length)
    }
    // build the page tree: a node's OWN entries are those at its root
    // level; deeper entries group by their ancestor voxel one level
    // down, each group becoming a child page (recursively split)
    case class Node(own: Seq[Entry], children: Seq[((Int, Int, Int, Int), Node)]) {
      val size: Int = (own.size + children.size) * EntryLen
    }
    def build(es: Seq[Entry], rootLevel: Int): Node = {
      if (es.length <= pageBudget) Node(es, Nil)
      else {
        val (own, deeper) = es.partition(_.level == rootLevel)
        if (deeper.isEmpty) Node(es, Nil) // unsplittable: multi-entry key run
        else {
          val groups = deeper.groupBy { e =>
            val s = e.level - (rootLevel + 1)
            (rootLevel + 1, e.x >> s, e.y >> s, e.z >> s)
          }
          Node(own, groups.toSeq.sortBy(_._1)
            .map { case (k, g) => (k, build(g, rootLevel + 1)) })
        }
      }
    }
    val root = build(entries, 0)
    // preorder offset assignment: a parent's reference entries need its
    // children's offsets, which depend only on sizes (known up front)
    var cursor = payloadStart
    case class Placed(node: Node, offset: Long,
        children: Seq[((Int, Int, Int, Int), Placed)])
    def place(n: Node): Placed = {
      val off = cursor
      cursor += n.size
      Placed(n, off, n.children.map { case (k, c) => (k, place(c)) })
    }
    val placedRoot = place(root)
    val total = (cursor - payloadStart).toInt
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    def emit(p: Placed): Unit = {
      val refs = p.children.map { case ((l, x, y, z), c) =>
        Entry(l, x, y, z, c.offset, c.node.size, -1)
      }
      buf.put(entriesPayload(p.node.own ++ refs))
      p.children.foreach { case (_, c) => emit(c) }
    }
    emit(placedRoot)
    (buf.array(), root.size)
  }

  /** The ancestor closure of a data-entry set: every proper ancestor
    * voxel up to the root that is not itself a data entry, as empty
    * entries (pointCount 0) — so the hierarchy forms a connected octree
    * a top-down reader can walk. LOD layouts carry data at interior
    * levels, hence the exclusion (a voxel must not appear twice). */
  def ancestorEntries(leaves: Seq[Entry]): Seq[Entry] = {
    val present = leaves.iterator.map(e => (e.level, e.x, e.y, e.z)).toSet
    val seen = scala.collection.mutable.Set.empty[(Int, Int, Int, Int)]
    leaves.foreach { e =>
      var (l, x, y, z) = (e.level, e.x, e.y, e.z)
      while (l > 0) {
        l -= 1; x >>= 1; y >>= 1; z >>= 1
        if (!present((l, x, y, z))) seen += ((l, x, y, z))
      }
    }
    seen.toSeq.sorted.map { case (l, x, y, z) => Entry(l, x, y, z, 0L, 0, 0) }
  }

  // ---- LOD (level-of-detail) point distribution -------------------------
  //
  // Real COPC corpora carry points at EVERY octree level (the coarse
  // levels are a gridded subsample — what a viewer streams first and what
  // an approximate query can answer from). The assignment here is a
  // DETERMINISTIC function of the raw integer coordinates, so an external
  // system (or the DuckDB oracle) can re-derive exactly which rows live
  // at which level with integer arithmetic alone — no RNG, no float math.

  /** Mixing hash of the raw integer coordinates (odd-multiplier XOR mix;
    * non-negative for non-negative inputs, exact in any int64 engine). */
  def lodHash(x: Int, y: Int, z: Int): Long =
    (x.toLong * 73856093L) ^ (y.toLong * 19349663L) ^ (z.toLong * 83492791L)

  /** Level for a hash under leaf level L: each trailing zero OCTAL digit
    * of the hash promotes one level (P ≈ 1/8 per step — the octree's
    * natural 1/8-per-level decay), capped at 4 promotions and at the
    * root. ~7/8 of points stay at the leaf level, ~1/8·7/8 one above,
    * and so on. */
  def lodLevel(h: Long, leaf: Int): Int = {
    var k = 0
    var m = 8L
    while (k < 4 && h % m == 0L) { k += 1; m *= 8L }
    math.max(leaf - k, 0)
  }

  /** Composite (level, voxel-at-level) key: level in the top 5 bits
    * above [[LodKeyBits]] of packed voxel key. Sorting by this groups
    * rows level-major, then spatially — the chunk-run order the LOD
    * writer needs. */
  def packLodKey(level: Int, key: Long): Long =
    (level.toLong << LodKeyBits) | key

  def unpackLodLevel(packed: Long): Int = (packed >>> LodKeyBits).toInt
  def unpackLodKey(packed: Long): Long = packed & ((1L << LodKeyBits) - 1)
}
