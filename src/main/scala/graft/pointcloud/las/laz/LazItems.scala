package graft.pointcloud.las.laz

/** Per-item LAZ codecs for the point-record item types this reader
  * supports: POINT10 (LAS formats 0–5 base record) and GPSTIME11 (the
  * +8-byte GPS time of formats 1/3-5). Each codec follows the published
  * LASzip version-2 prediction scheme (LASzip: "lossless compression of
  * LiDAR data", Isenburg 2013, and the public LAZ format specification):
  * POINT10 predicts x/y deltas with per-return-context streaming medians
  * and codes everything through [[IntegerCompressor]]/adaptive models;
  * GPSTIME11 keeps four delta sequences with multiplier coding.
  *
  * A codec instance is chunk-scoped state: `init` seeds it from the
  * chunk's raw first point and resets every model, which is what makes
  * LAZ chunks independently decodable (the split unit of the scan).
  * The encoder and decoder run the SAME state machine — every model
  * update and every `last*` mutation below is mirrored — so
  * decode(encode(points)) == points exactly; see the package scaladoc
  * for what self-round-trip does and does not verify.
  */
private[las] sealed trait LazItemCodec {
  /** Raw item size in bytes. */
  def size: Int
  /** Seed chunk state from the raw first point's item bytes. */
  def init(first: Array[Byte], off: Int): Unit
  /** Decode the next point's item into `out` (also updates state). */
  def read(dec: ArithmeticDecoder, out: Array[Byte], off: Int): Unit
  /** Encode the next point's item from `cur` (also updates state). */
  def write(enc: ArithmeticEncoder, cur: Array[Byte], off: Int): Unit
}

private[las] object LazItemCodec {
  // LAZ item type codes (public LAZ spec)
  final val TypeByte = 0
  final val TypePoint10 = 6
  final val TypeGpsTime11 = 7
  final val TypeRgb12 = 8
  final val TypeWavepacket13 = 9
  // the LAS 1.4 layered-scheme items (compressor 3, item version 3)
  final val TypePoint14 = 10
  final val TypeRgb14 = 11
  final val TypeRgbNir14 = 12
  final val TypeWavepacket14 = 13
  final val TypeByte14 = 14

  def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
  }
  def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  def putI32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }
  def i64(b: Array[Byte], off: Int): Long =
    (i32(b, off).toLong & 0xFFFFFFFFL) | (i32(b, off + 4).toLong << 32)
  def putI64(b: Array[Byte], off: Int, v: Long): Unit = {
    putI32(b, off, v.toInt); putI32(b, off + 4, (v >>> 32).toInt)
  }

  /** Context tables of the public POINT10 v2 scheme: `map` folds the
    * (number-of-returns, return-number) pair into 16 prediction
    * contexts, `level` is their distance |n - r| (8 height contexts). */
  val NumberReturnMap: Array[Array[Int]] = Array(
    Array(15, 14, 13, 12, 11, 10, 9, 8),
    Array(14, 0, 1, 3, 6, 10, 10, 9),
    Array(13, 1, 2, 4, 7, 11, 11, 10),
    Array(12, 3, 4, 5, 8, 12, 12, 11),
    Array(11, 6, 7, 8, 9, 13, 13, 12),
    Array(10, 10, 11, 12, 13, 14, 14, 13),
    Array(9, 10, 11, 12, 13, 14, 15, 14),
    Array(8, 9, 10, 11, 12, 13, 14, 15))
  val NumberReturnLevel: Array[Array[Int]] =
    Array.tabulate(8, 8)((n, r) => math.abs(n - r))
}

/** POINT10: the 20-byte base record of LAS formats 0–5
  * (x,y,z i32; intensity u16; flags; classification; scan-angle i8;
  * user-data; point-source-id u16). */
private[las] final class Point10Codec extends LazItemCodec {
  import LazItemCodec._

  override def size: Int = 20

  private val lastItem = new Array[Byte](20)
  private val mChangedValues = new SymbolModel(64)
  private val mBitByte = new Array[SymbolModel](256)
  private val mClassification = new Array[SymbolModel](256)
  private val mUserData = new Array[SymbolModel](256)
  private val mScanAngleRank = Array.fill(2)(new SymbolModel(256))
  private val icIntensity = new IntegerCompressor(16, 4)
  private val icPointSourceId = new IntegerCompressor(16, 1)
  private val icDx = new IntegerCompressor(32, 2)
  private val icDy = new IntegerCompressor(32, 22)
  private val icZ = new IntegerCompressor(32, 20)
  private val lastXDiff = Array.fill(16)(new StreamingMedian5)
  private val lastYDiff = Array.fill(16)(new StreamingMedian5)
  private val lastIntensity = new Array[Int](16)
  private val lastHeight = new Array[Int](8)

  override def init(first: Array[Byte], off: Int): Unit = {
    mChangedValues.reset()
    java.util.Arrays.fill(mBitByte.asInstanceOf[Array[AnyRef]], null)
    java.util.Arrays.fill(mClassification.asInstanceOf[Array[AnyRef]], null)
    java.util.Arrays.fill(mUserData.asInstanceOf[Array[AnyRef]], null)
    mScanAngleRank.foreach(_.reset())
    icIntensity.reset(); icPointSourceId.reset()
    icDx.reset(); icDy.reset(); icZ.reset()
    lastXDiff.foreach(_.reset()); lastYDiff.foreach(_.reset())
    java.util.Arrays.fill(lastIntensity, 0)
    java.util.Arrays.fill(lastHeight, 0)
    System.arraycopy(first, off, lastItem, 0, 20)
  }

  private def lazily(arr: Array[SymbolModel], i: Int): SymbolModel = {
    if (arr(i) == null) arr(i) = new SymbolModel(256)
    arr(i)
  }

  override def read(dec: ArithmeticDecoder, out: Array[Byte], off: Int): Unit = {
    val changed = dec.decodeSymbol(mChangedValues)
    if ((changed & 32) != 0) {
      val lb = lastItem(14) & 0xFF
      lastItem(14) = dec.decodeSymbol(lazily(mBitByte, lb)).toByte
    }
    val flags = lastItem(14) & 0xFF
    val r = flags & 7
    val n = (flags >>> 3) & 7
    val m = NumberReturnMap(n)(r)
    val l = NumberReturnLevel(n)(r)
    if ((changed & 16) != 0)
      lastIntensity(m) = icIntensity.decompress(dec, lastIntensity(m), if (m < 3) m else 3)
    // intensity is context-predicted: the point's value is the CONTEXT's
    // last intensity, which need not equal the previous point's
    putU16(lastItem, 12, lastIntensity(m))
    if ((changed & 8) != 0)
      lastItem(15) = dec.decodeSymbol(lazily(mClassification, lastItem(15) & 0xFF)).toByte
    if ((changed & 4) != 0) {
      val f = (flags >>> 6) & 1
      lastItem(16) = ((dec.decodeSymbol(mScanAngleRank(f)) + (lastItem(16) & 0xFF)) & 0xFF).toByte
    }
    if ((changed & 2) != 0)
      lastItem(17) = dec.decodeSymbol(lazily(mUserData, lastItem(17) & 0xFF)).toByte
    if ((changed & 1) != 0)
      putU16(lastItem, 18, icPointSourceId.decompress(dec, u16(lastItem, 18), 0))
    // x: streaming-median-predicted delta per return context
    val dx = icDx.decompress(dec, lastXDiff(m).get, if (n == 1) 1 else 0)
    putI32(lastItem, 0, i32(lastItem, 0) + dx)
    lastXDiff(m).add(dx)
    // y: context folds in the magnitude class of the x delta
    val kx = icDx.getK
    val dy = icDy.decompress(dec, lastYDiff(m).get,
      (if (n == 1) 1 else 0) + (if (kx < 20) kx & ~1 else 20))
    putI32(lastItem, 4, i32(lastItem, 4) + dy)
    lastYDiff(m).add(dy)
    // z: predicted by the level context's last height; the context keeps
    // the published (n==1) term (odd indices of icZ's 20 contexts)
    val kxy = (icDx.getK + icDy.getK) / 2
    val z = icZ.decompress(dec, lastHeight(l),
      (if (n == 1) 1 else 0) + (if (kxy < 18) kxy & ~1 else 18))
    putI32(lastItem, 8, z)
    lastHeight(l) = z
    System.arraycopy(lastItem, 0, out, off, 20)
  }

  override def write(enc: ArithmeticEncoder, cur: Array[Byte], off: Int): Unit = {
    val lastFlags = lastItem(14) & 0xFF
    val flags = cur(off + 14) & 0xFF
    val r = flags & 7
    val n = (flags >>> 3) & 7
    val m = NumberReturnMap(n)(r)
    val l = NumberReturnLevel(n)(r)
    val intensity = u16(cur, off + 12)
    val cls = cur(off + 15) & 0xFF
    val sar = cur(off + 16) & 0xFF
    val ud = cur(off + 17) & 0xFF
    val psid = u16(cur, off + 18)
    val changed =
      (if (flags != lastFlags) 32 else 0) |
        (if (lastIntensity(m) != intensity) 16 else 0) |
        (if (cls != (lastItem(15) & 0xFF)) 8 else 0) |
        (if (sar != (lastItem(16) & 0xFF)) 4 else 0) |
        (if (ud != (lastItem(17) & 0xFF)) 2 else 0) |
        (if (psid != u16(lastItem, 18)) 1 else 0)
    enc.encodeSymbol(mChangedValues, changed)
    if ((changed & 32) != 0) enc.encodeSymbol(lazily(mBitByte, lastFlags), flags)
    if ((changed & 16) != 0) {
      icIntensity.compress(enc, lastIntensity(m), intensity, if (m < 3) m else 3)
      lastIntensity(m) = intensity
    }
    if ((changed & 8) != 0) enc.encodeSymbol(lazily(mClassification, lastItem(15) & 0xFF), cls)
    if ((changed & 4) != 0) {
      val f = (flags >>> 6) & 1
      enc.encodeSymbol(mScanAngleRank(f), (sar - (lastItem(16) & 0xFF)) & 0xFF)
    }
    if ((changed & 2) != 0) enc.encodeSymbol(lazily(mUserData, lastItem(17) & 0xFF), ud)
    if ((changed & 1) != 0) icPointSourceId.compress(enc, u16(lastItem, 18), psid, 0)
    val dx = i32(cur, off) - i32(lastItem, 0)
    icDx.compress(enc, lastXDiff(m).get, dx, if (n == 1) 1 else 0)
    lastXDiff(m).add(dx)
    val kx = icDx.getK
    val dy = i32(cur, off + 4) - i32(lastItem, 4)
    icDy.compress(enc, lastYDiff(m).get, dy,
      (if (n == 1) 1 else 0) + (if (kx < 20) kx & ~1 else 20))
    lastYDiff(m).add(dy)
    val kxy = (icDx.getK + icDy.getK) / 2
    val z = i32(cur, off + 8)
    icZ.compress(enc, lastHeight(l), z,
      (if (n == 1) 1 else 0) + (if (kxy < 18) kxy & ~1 else 18))
    lastHeight(l) = z
    System.arraycopy(cur, off, lastItem, 0, 20)
  }
}

/** The r/g/b u16-triple coding state of the public LASzip scheme (RGB12
  * v2, and per-channel-context inside RGB14 v3): each of the six bytes a
  * model-coded delta, with a change-mask symbol up front — bit k flags
  * byte k changed vs the last point, bit 6 flags "g/b differ from r" (a
  * grayscale point codes its r bytes only and the decoder copies them
  * across). Green predicts from last-green shifted by red's delta; blue
  * from last-blue shifted by the averaged r/g deltas (clamped to byte
  * range before the model delta). */
private[las] final class RgbState {
  import LazItemCodec._

  private val mByteUsed = new SymbolModel(128)
  private val mRgbDiff = Array.fill(6)(new SymbolModel(256))
  val lastRgb = new Array[Int](3)

  def seed(r: Int, g: Int, b: Int): Unit = {
    mByteUsed.reset()
    mRgbDiff.foreach(_.reset())
    lastRgb(0) = r; lastRgb(1) = g; lastRgb(2) = b
  }

  private def clamp(x: Int): Int = if (x < 0) 0 else if (x > 255) 255 else x

  /** Decode the next triple into `lastRgb`. */
  def readRgb(dec: ArithmeticDecoder): Unit = {
    val sym = dec.decodeSymbol(mByteUsed)
    val lrl = lastRgb(0) & 0xFF; val lrh = lastRgb(0) >>> 8
    val lgl = lastRgb(1) & 0xFF; val lgh = lastRgb(1) >>> 8
    val lbl = lastRgb(2) & 0xFF; val lbh = lastRgb(2) >>> 8
    val rl = if ((sym & 1) != 0) (dec.decodeSymbol(mRgbDiff(0)) + lrl) & 0xFF else lrl
    val rh = if ((sym & 2) != 0) (dec.decodeSymbol(mRgbDiff(1)) + lrh) & 0xFF else lrh
    var gl = rl; var gh = rh; var bl = rl; var bh = rh
    if ((sym & 64) != 0) {
      val diffL = rl - lrl
      gl = if ((sym & 4) != 0) (dec.decodeSymbol(mRgbDiff(2)) + clamp(diffL + lgl)) & 0xFF else lgl
      bl = if ((sym & 16) != 0)
        (dec.decodeSymbol(mRgbDiff(4)) + clamp((diffL + gl - lgl) / 2 + lbl)) & 0xFF
      else lbl
      val diffH = rh - lrh
      gh = if ((sym & 8) != 0) (dec.decodeSymbol(mRgbDiff(3)) + clamp(diffH + lgh)) & 0xFF else lgh
      bh = if ((sym & 32) != 0)
        (dec.decodeSymbol(mRgbDiff(5)) + clamp((diffH + gh - lgh) / 2 + lbh)) & 0xFF
      else lbh
    }
    lastRgb(0) = (rh << 8) | rl
    lastRgb(1) = (gh << 8) | gl
    lastRgb(2) = (bh << 8) | bl
  }

  /** Encode the next triple (also updates `lastRgb`). */
  def writeRgb(enc: ArithmeticEncoder, r: Int, g: Int, b: Int): Unit = {
    val rl = r & 0xFF; val rh = r >>> 8
    val gl = g & 0xFF; val gh = g >>> 8
    val bl = b & 0xFF; val bh = b >>> 8
    val lrl = lastRgb(0) & 0xFF; val lrh = lastRgb(0) >>> 8
    val lgl = lastRgb(1) & 0xFF; val lgh = lastRgb(1) >>> 8
    val lbl = lastRgb(2) & 0xFF; val lbh = lastRgb(2) >>> 8
    // bits 2-5 compare g/b against the last point UNCONDITIONALLY (the
    // published scheme); the decoder only consults them under bit 6, but
    // the coded symbol value must match or model state diverges
    val rgbDiffer = g != r || b != r
    var sym = 0
    if (rl != lrl) sym |= 1
    if (rh != lrh) sym |= 2
    if (gl != lgl) sym |= 4
    if (gh != lgh) sym |= 8
    if (bl != lbl) sym |= 16
    if (bh != lbh) sym |= 32
    if (rgbDiffer) sym |= 64
    enc.encodeSymbol(mByteUsed, sym)
    if ((sym & 1) != 0) enc.encodeSymbol(mRgbDiff(0), (rl - lrl) & 0xFF)
    if ((sym & 2) != 0) enc.encodeSymbol(mRgbDiff(1), (rh - lrh) & 0xFF)
    if ((sym & 64) != 0) {
      val diffL = rl - lrl
      if ((sym & 4) != 0) enc.encodeSymbol(mRgbDiff(2), (gl - clamp(diffL + lgl)) & 0xFF)
      if ((sym & 16) != 0)
        enc.encodeSymbol(mRgbDiff(4), (bl - clamp((diffL + gl - lgl) / 2 + lbl)) & 0xFF)
      val diffH = rh - lrh
      if ((sym & 8) != 0) enc.encodeSymbol(mRgbDiff(3), (gh - clamp(diffH + lgh)) & 0xFF)
      if ((sym & 32) != 0)
        enc.encodeSymbol(mRgbDiff(5), (bh - clamp((diffH + gh - lgh) / 2 + lbh)) & 0xFF)
    }
    lastRgb(0) = r; lastRgb(1) = g; lastRgb(2) = b
  }
}

/** RGB12: the 6-byte r/g/b u16 triple of formats 2/3/5 — a thin item
  * wrapper over [[RgbState]] (chunk-scoped, seeded from the raw first
  * point). */
private[las] final class Rgb12Codec extends LazItemCodec {
  import LazItemCodec._

  override def size: Int = 6

  private val state = new RgbState

  override def init(first: Array[Byte], off: Int): Unit =
    state.seed(u16(first, off), u16(first, off + 2), u16(first, off + 4))

  override def read(dec: ArithmeticDecoder, out: Array[Byte], off: Int): Unit = {
    state.readRgb(dec)
    putU16(out, off, state.lastRgb(0))
    putU16(out, off + 2, state.lastRgb(1))
    putU16(out, off + 4, state.lastRgb(2))
  }

  override def write(enc: ArithmeticEncoder, cur: Array[Byte], off: Int): Unit =
    state.writeRgb(enc, u16(cur, off), u16(cur, off + 2), u16(cur, off + 4))
}

/** BYTE: `n` opaque extra bytes per record (the ExtraBytes tail under
  * compression) — each byte position delta-coded through its own
  * 256-symbol model (the public v2 scheme). */
private[las] final class BytesCodec(n: Int) extends LazItemCodec {
  require(n > 0, s"BYTE item needs a positive size, got $n")

  override def size: Int = n

  private val models = Array.fill(n)(new SymbolModel(256))
  private val lastBytes = new Array[Byte](n)

  override def init(first: Array[Byte], off: Int): Unit = {
    models.foreach(_.reset())
    System.arraycopy(first, off, lastBytes, 0, n)
  }

  override def read(dec: ArithmeticDecoder, out: Array[Byte], off: Int): Unit = {
    var i = 0
    while (i < n) {
      lastBytes(i) = ((dec.decodeSymbol(models(i)) + lastBytes(i)) & 0xFF).toByte
      out(off + i) = lastBytes(i)
      i += 1
    }
  }

  override def write(enc: ArithmeticEncoder, cur: Array[Byte], off: Int): Unit = {
    var i = 0
    while (i < n) {
      enc.encodeSymbol(models(i), (cur(off + i) - lastBytes(i)) & 0xFF)
      lastBytes(i) = cur(off + i)
      i += 1
    }
  }
}

/** The multi-sequence GPS-time delta machine of the public LASzip scheme
  * (GPSTIME11 v2, and per-scanner-channel inside POINT14 v3): up to four
  * interleaved time sequences over the raw f64 bit pattern, each
  * predicting the next value as last + multiplier × last-delta. Extracted
  * so [[GpsTime11Codec]] holds one instance and [[Point14Codec]] one per
  * channel context; the encoder/decoder sides stay mirrored through the
  * shared state updates. */
private[las] final class GpsTimeState {
  import LazItemCodec._

  private final val Multi = 500
  private final val MultiMinus = -10
  private final val MultiUnchanged = Multi - MultiMinus + 1 // 511
  private final val MultiCodeFull = Multi - MultiMinus + 2 // 512
  private final val MultiTotal = Multi - MultiMinus + 6 // 516

  private val mGpsTimeMulti = new SymbolModel(MultiTotal)
  private val mGpsTime0Diff = new SymbolModel(6)
  private val icGpsTime = new IntegerCompressor(32, 9)
  private var last = 0
  private var next = 0
  private val lastGpsTime = new Array[Long](4)
  private val lastGpsTimeDiff = new Array[Int](4)
  private val multiExtremeCounter = new Array[Int](4)

  /** Reset all models/sequences and seed sequence 0 with `t0` (the raw
    * i64 bits of the chunk's — or context's — first time value). */
  def seed(t0: Long): Unit = {
    mGpsTimeMulti.reset()
    mGpsTime0Diff.reset()
    icGpsTime.reset()
    last = 0; next = 0
    java.util.Arrays.fill(lastGpsTime, 0L)
    java.util.Arrays.fill(lastGpsTimeDiff, 0)
    java.util.Arrays.fill(multiExtremeCounter, 0)
    lastGpsTime(0) = t0
  }

  /** Current sequence's time bits (what a decoded point reports). */
  def current: Long = lastGpsTime(last)

  private def quantize(f: Float): Int =
    if (f >= 0) (f + 0.5f).toInt else (f - 0.5f).toInt

  def readTime(dec: ArithmeticDecoder): Unit = {
    if (lastGpsTimeDiff(last) == 0) {
      val multi = dec.decodeSymbol(mGpsTime0Diff)
      if (multi == 1) { // difference fits 32 bits
        lastGpsTimeDiff(last) = icGpsTime.decompress(dec, 0, 0)
        lastGpsTime(last) += lastGpsTimeDiff(last)
        multiExtremeCounter(last) = 0
      } else if (multi == 2) { // full 64-bit value
        readFull(dec)
      } else if (multi > 2) { // switch to another sequence
        last = (last + multi - 2) & 3
        readTime(dec)
      }
      // multi == 0: time unchanged
    } else {
      val multi = dec.decodeSymbol(mGpsTimeMulti)
      if (multi == 1) {
        lastGpsTimeDiff(last) = icGpsTime.decompress(dec, lastGpsTimeDiff(last), 1)
        lastGpsTime(last) += lastGpsTimeDiff(last)
        multiExtremeCounter(last) = 0
      } else if (multi < MultiUnchanged) {
        var diff = 0
        if (multi == 0) {
          diff = icGpsTime.decompress(dec, 0, 7)
          multiExtremeCounter(last) += 1
          if (multiExtremeCounter(last) > 3) {
            lastGpsTimeDiff(last) = diff
            multiExtremeCounter(last) = 0
          }
        } else if (multi < Multi) {
          diff = icGpsTime.decompress(dec, multi * lastGpsTimeDiff(last),
            if (multi < 10) 2 else 3)
        } else if (multi == Multi) {
          diff = icGpsTime.decompress(dec, Multi * lastGpsTimeDiff(last), 4)
          multiExtremeCounter(last) += 1
          if (multiExtremeCounter(last) > 3) {
            lastGpsTimeDiff(last) = diff
            multiExtremeCounter(last) = 0
          }
        } else { // negative multipliers, symbols Multi+1 .. Multi-MultiMinus
          val mult = Multi - multi
          if (mult > MultiMinus) {
            diff = icGpsTime.decompress(dec, mult * lastGpsTimeDiff(last), 5)
          } else {
            diff = icGpsTime.decompress(dec, MultiMinus * lastGpsTimeDiff(last), 6)
            multiExtremeCounter(last) += 1
            if (multiExtremeCounter(last) > 3) {
              lastGpsTimeDiff(last) = diff
              multiExtremeCounter(last) = 0
            }
          }
        }
        lastGpsTime(last) += diff
      } else if (multi == MultiCodeFull) {
        readFull(dec)
      } else if (multi > MultiCodeFull) {
        last = (last + multi - MultiCodeFull) & 3
        readTime(dec)
      }
      // multi == MultiUnchanged: time unchanged
    }
  }

  private def readFull(dec: ArithmeticDecoder): Unit = {
    next = (next + 1) & 3
    val high = icGpsTime.decompress(dec, (lastGpsTime(last) >>> 32).toInt, 8)
    val low = dec.readInt()
    lastGpsTime(next) = (high.toLong << 32) | (low & 0xFFFFFFFFL)
    last = next
    lastGpsTimeDiff(last) = 0
    multiExtremeCounter(last) = 0
  }

  def writeTime(enc: ArithmeticEncoder, t: Long): Unit = {
    if (lastGpsTimeDiff(last) == 0) {
      if (t == lastGpsTime(last)) {
        enc.encodeSymbol(mGpsTime0Diff, 0)
      } else {
        val diff64 = t - lastGpsTime(last)
        val diff32 = diff64.toInt
        if (diff64 == diff32.toLong) { // fits 32 bits
          enc.encodeSymbol(mGpsTime0Diff, 1)
          icGpsTime.compress(enc, 0, diff32, 0)
          lastGpsTimeDiff(last) = diff32
          lastGpsTime(last) = t
          multiExtremeCounter(last) = 0
        } else {
          // a nearby sequence may absorb the jump without a full reset
          var i = 1
          while (i < 4) {
            val other = t - lastGpsTime((last + i) & 3)
            if (other == other.toInt.toLong) {
              enc.encodeSymbol(mGpsTime0Diff, i + 2)
              last = (last + i) & 3
              writeTime(enc, t)
              return
            }
            i += 1
          }
          enc.encodeSymbol(mGpsTime0Diff, 2)
          writeFull(enc, t)
        }
      }
    } else {
      if (t == lastGpsTime(last)) {
        enc.encodeSymbol(mGpsTimeMulti, MultiUnchanged)
      } else {
        val diff64 = t - lastGpsTime(last)
        val diff32 = diff64.toInt
        if (diff64 == diff32.toLong) {
          val multi = quantize(diff32.toFloat / lastGpsTimeDiff(last).toFloat)
          if (multi == 1) {
            enc.encodeSymbol(mGpsTimeMulti, 1)
            icGpsTime.compress(enc, lastGpsTimeDiff(last), diff32, 1)
            lastGpsTimeDiff(last) = diff32
            multiExtremeCounter(last) = 0
          } else if (multi > 1 && multi < Multi) {
            enc.encodeSymbol(mGpsTimeMulti, multi)
            icGpsTime.compress(enc, multi * lastGpsTimeDiff(last), diff32,
              if (multi < 10) 2 else 3)
          } else if (multi >= Multi) {
            enc.encodeSymbol(mGpsTimeMulti, Multi)
            icGpsTime.compress(enc, Multi * lastGpsTimeDiff(last), diff32, 4)
            multiExtremeCounter(last) += 1
            if (multiExtremeCounter(last) > 3) {
              lastGpsTimeDiff(last) = diff32
              multiExtremeCounter(last) = 0
            }
          } else if (multi < 0 && multi > MultiMinus) {
            enc.encodeSymbol(mGpsTimeMulti, Multi - multi)
            icGpsTime.compress(enc, multi * lastGpsTimeDiff(last), diff32, 5)
          } else if (multi <= MultiMinus) {
            enc.encodeSymbol(mGpsTimeMulti, Multi - MultiMinus)
            icGpsTime.compress(enc, MultiMinus * lastGpsTimeDiff(last), diff32, 6)
            multiExtremeCounter(last) += 1
            if (multiExtremeCounter(last) > 3) {
              lastGpsTimeDiff(last) = diff32
              multiExtremeCounter(last) = 0
            }
          } else { // multi == 0
            enc.encodeSymbol(mGpsTimeMulti, 0)
            icGpsTime.compress(enc, 0, diff32, 7)
            multiExtremeCounter(last) += 1
            if (multiExtremeCounter(last) > 3) {
              lastGpsTimeDiff(last) = diff32
              multiExtremeCounter(last) = 0
            }
          }
          lastGpsTime(last) = t
        } else {
          var i = 1
          while (i < 4) {
            val other = t - lastGpsTime((last + i) & 3)
            if (other == other.toInt.toLong) {
              enc.encodeSymbol(mGpsTimeMulti, MultiCodeFull + i)
              last = (last + i) & 3
              writeTime(enc, t)
              return
            }
            i += 1
          }
          enc.encodeSymbol(mGpsTimeMulti, MultiCodeFull)
          writeFull(enc, t)
        }
      }
    }
  }

  private def writeFull(enc: ArithmeticEncoder, t: Long): Unit = {
    next = (next + 1) & 3
    icGpsTime.compress(enc, (lastGpsTime(last) >>> 32).toInt, (t >>> 32).toInt, 8)
    enc.writeInt(t & 0xFFFFFFFFL)
    lastGpsTime(next) = t
    last = next
    lastGpsTimeDiff(last) = 0
    multiExtremeCounter(last) = 0
  }
}

/** GPSTIME11: the 8-byte f64 GPS time of formats 1/3–5 — a thin item
  * wrapper over [[GpsTimeState]] (chunk-scoped, seeded from the raw
  * first point). */
private[las] final class GpsTime11Codec extends LazItemCodec {
  import LazItemCodec._

  override def size: Int = 8

  private val state = new GpsTimeState

  override def init(first: Array[Byte], off: Int): Unit =
    state.seed(i64(first, off))

  override def read(dec: ArithmeticDecoder, out: Array[Byte], off: Int): Unit = {
    state.readTime(dec)
    putI64(out, off, state.current)
  }

  override def write(enc: ArithmeticEncoder, cur: Array[Byte], off: Int): Unit =
    state.writeTime(enc, i64(cur, off))
}

/** Chunk-scoped prediction state for one 29-byte waveform packet item
  * (u8 descriptor index, u64 waveform-data offset, u32 packet size,
  * f32 return-point location, f32×3 parametric direction), following
  * the published WAVEPACKET13 scheme: the offset is classified against
  * the previous packet (same / directly-following / 32-bit-diff / raw
  * 64-bit) through a 4-symbol model whose context is the PREVIOUS
  * classification, and every other field delta-codes its raw 32 bits
  * (floats as bit patterns — prediction never does float arithmetic)
  * through [[IntegerCompressor]]. Shared by the pointwise item codec
  * (formats 4/5) and, one instance per scanner-channel context, by the
  * layered one (formats 9/10). */
private[las] final class WavePacketState {
  import LazItemCodec._

  private val mIndex = new SymbolModel(256)
  private val mOffsetDiff = Array.fill(4)(new SymbolModel(4))
  private val icOffsetDiff = new IntegerCompressor(32, 1)
  private val icPacketSize = new IntegerCompressor(32, 1)
  private val icLocation = new IntegerCompressor(32, 1)
  private val icXyz = new IntegerCompressor(32, 3)
  val last = new Array[Byte](29)
  private var lastDiff32 = 0
  private var symLast = 0

  def seed(item: Array[Byte], off: Int): Unit = {
    System.arraycopy(item, off, last, 0, 29)
    mIndex.reset(); mOffsetDiff.foreach(_.reset())
    icOffsetDiff.reset(); icPacketSize.reset(); icLocation.reset()
    icXyz.reset()
    lastDiff32 = 0
    symLast = 0
  }

  def write(enc: ArithmeticEncoder, cur: Array[Byte], off: Int): Unit = {
    enc.encodeSymbol(mIndex, cur(off) & 0xFF)
    val offs = i64(cur, off + 1)
    val lastOffs = i64(last, 1)
    // "directly following" = last offset + last packet size (u32)
    val following = lastOffs + (i32(last, 9).toLong & 0xFFFFFFFFL)
    val diff = offs - lastOffs
    val sym =
      if (offs == lastOffs) 0
      else if (offs == following) 1
      else if (diff == diff.toInt.toLong) 2
      else 3
    enc.encodeSymbol(mOffsetDiff(symLast), sym)
    symLast = sym
    if (sym == 2) {
      icOffsetDiff.compress(enc, lastDiff32, diff.toInt, 0)
      lastDiff32 = diff.toInt
    } else if (sym == 3) {
      enc.writeInt(offs & 0xFFFFFFFFL)
      enc.writeInt(offs >>> 32)
    }
    icPacketSize.compress(enc, i32(last, 9), i32(cur, off + 9), 0)
    icLocation.compress(enc, i32(last, 13), i32(cur, off + 13), 0)
    icXyz.compress(enc, i32(last, 17), i32(cur, off + 17), 0)
    icXyz.compress(enc, i32(last, 21), i32(cur, off + 21), 1)
    icXyz.compress(enc, i32(last, 25), i32(cur, off + 25), 2)
    System.arraycopy(cur, off, last, 0, 29)
  }

  def read(dec: ArithmeticDecoder, out: Array[Byte], off: Int): Unit = {
    out(off) = dec.decodeSymbol(mIndex).toByte
    val lastOffs = i64(last, 1)
    val sym = dec.decodeSymbol(mOffsetDiff(symLast))
    symLast = sym
    val offs = sym match {
      case 0 => lastOffs
      case 1 => lastOffs + (i32(last, 9).toLong & 0xFFFFFFFFL)
      case 2 =>
        val d = icOffsetDiff.decompress(dec, lastDiff32, 0)
        lastDiff32 = d
        lastOffs + d
      case _ =>
        val lo = dec.readInt() & 0xFFFFFFFFL
        val hi = dec.readInt() & 0xFFFFFFFFL
        (hi << 32) | lo
    }
    putI64(out, off + 1, offs)
    putI32(out, off + 9, icPacketSize.decompress(dec, i32(last, 9), 0))
    putI32(out, off + 13, icLocation.decompress(dec, i32(last, 13), 0))
    putI32(out, off + 17, icXyz.decompress(dec, i32(last, 17), 0))
    putI32(out, off + 21, icXyz.decompress(dec, i32(last, 21), 1))
    putI32(out, off + 25, icXyz.decompress(dec, i32(last, 25), 2))
    System.arraycopy(out, off, last, 0, 29)
  }
}

/** WAVEPACKET13: the 29-byte waveform packet tail of formats 4/5 — a
  * thin pointwise item wrapper over [[WavePacketState]]. */
private[las] final class WavePacket13Codec extends LazItemCodec {
  override def size: Int = 29

  private val state = new WavePacketState

  override def init(first: Array[Byte], off: Int): Unit = state.seed(first, off)

  override def read(dec: ArithmeticDecoder, out: Array[Byte], off: Int): Unit =
    state.read(dec, out, off)

  override def write(enc: ArithmeticEncoder, cur: Array[Byte], off: Int): Unit =
    state.write(enc, cur, off)
}
