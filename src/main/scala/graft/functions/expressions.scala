package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers referenced from generated (Janino) code — a standalone
  * Scala object gets Java static forwarders, so `graft.functions.HashUtil
  * .rollingHash(...)` resolves inside whole-stage codegen.
  */
object HashUtil {
  final val Mod = 1000000007L
  /** FNV-1a 64-bit parameters (public constants); the DuckDB oracle
    * reproduces the fold with HUGEINT arithmetic mod 2^64. */
  final val FnvBasis = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** Polynomial rolling hash over UTF-16 code units, mod 1e9+7.
    * Matches `list_reduce(... (acc*31+ascii(c)) % 1000000007)` in the
    * DuckDB oracle for ASCII/BMP text. */
  def rollingHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) { h = (h * 31 + str.charAt(i)) % Mod; i += 1 }
    h
  }

  /** Sorted distinct rolling hashes of all word n-gram shingles, fused:
    * h(t1 ⧺ ' ' ⧺ t2 ⧺ …) composes from per-token hashes via
    * h(a ⧺ b) = h(a)·31^|b| + h(b) (mod M), so the whole document costs
    * O(chars + shingles·n) with zero intermediate shingle strings —
    * versus the interpreted transform/concat_ws/array_distinct chain
    * which allocates every shingle. Values are IDENTICAL to hashing the
    * materialized "t1 t2 t3" strings, so the DuckDB oracle's
    * char-fold reproduces them exactly. */
  def shingleHashSet(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Long])
    // per-token hash and 31^length (mod M)
    val th = new Array[Long](m)
    val tp = new Array[Long](m)
    var i = 0
    while (i < m) {
      val t = tokens.getUTF8String(i)
      val s = if (t == null) "" else t.toString
      var h = 0L; var p = 1L
      var k = 0
      while (k < s.length) { h = (h * 31 + s.charAt(k)) % Mod; p = (p * 31) % Mod; k += 1 }
      th(i) = h; tp(i) = p
      i += 1
    }
    val hs = new Array[Long](cnt)
    i = 0
    while (i < cnt) {
      var h = th(i)
      var j = 1
      while (j < n) {
        h = (h * 31 + ' ') % Mod          // separator
        h = (h * tp(i + j) + th(i + j)) % Mod
        j += 1
      }
      hs(i) = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place unique
    var w = 0
    i = 0
    while (i < cnt) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  /** All character n-grams of a string, 1-based substring semantics
    * identical to `substring(s, i, n)` — fused replacement for the
    * interpreted transform(sequence(...), substr) chain. */
  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    val cnt = len - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cnt)
    var i = 0
    while (i < cnt) { out(i) = s.substringSQL(i + 1, n); i += 1 }
    new GenericArrayData(out)
  }

  /** All word n-grams of a single-space-tokenized string, WITH repeats
    * (the repetition-metric multiset — contrast shingleHashSet's sorted
    * distinct set). Split semantics match Spark's `split(text, " ")`
    * (limit -1: empty tokens kept); grams join with one space, matching
    * the oracle's `ws[k] || ' ' || ws[k+1]`. One pass, no interpreted
    * transform/sequence/slice chain. */
  def wordNgrams(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val cnt = toks.length - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cnt)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < cnt) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Count of tokens contained in a fixed set — single codegen pass
    * instead of an interpreted filter lambda per marker list. */
  def countInSet(tokens: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = tokens.numElements()
    var i = 0; var c = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && set.contains(tokens.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** FNV-1a 64-bit over a string's UTF-8 bytes — the per-token hash
    * feeding SimHash. Self-contained and stable across releases. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvBasis
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * FnvPrime; i += 1 }
    h
  }

  /** Fused single-pass token statistics over the raw UTF-8 bytes: token
    * count, stopword count, summed code-point length, and the chars/4
    * BPE-ish subword estimate — exactly the values of the unfused
    * `split(text,' ')`-based formulas (single-space split keeping empty
    * tokens, Spark split semantics), without materializing the token
    * array or re-splitting once per metric. Space (0x20) never occurs
    * inside a UTF-8 multi-byte sequence, so byte scanning is safe; code
    * points are counted as non-continuation bytes. Only tokens no longer
    * than `maxStopBytes` allocate a lookup key. */
  def tokenStats(s: UTF8String,
      stopwords: java.util.HashSet[UTF8String], maxStopBytes: Int): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var tc = 0; var sc = 0; var cl = 0L; var bpe = 0L
    var start = 0
    var tokChars = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        tc += 1
        cl += tokChars
        bpe += (tokChars + 3) / 4
        val blen = i - start
        if (blen > 0 && blen <= maxStopBytes &&
            stopwords.contains(UTF8String.fromBytes(bytes, start, blen))) sc += 1
        tokChars = 0
        start = i + 1
      } else if ((bytes(i) & 0xc0) != 0x80) {
        tokChars += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](tc, sc, cl, bpe))
  }

  /** Multiplicative (Fibonacci) finalizer for the KMV sketch hash: FNV-1a
    * alone clusters badly on short inputs (consecutive integer keys leave
    * the high bits nearly constant, which wrecks an order-statistics
    * estimator); one multiply by the odd golden-ratio constant diffuses
    * the low-bit differences into the high bits. The result is shifted
    * into [0, 2^63) so BOTH engines can carry it as a plain signed 64-bit
    * integer — the DuckDB oracle reproduces the mod-2^64 multiply with a
    * 32-bit-split HUGEINT product, and a single right shift never needs
    * unsigned casts anywhere. */
  final val KmvPhi = 0x9E3779B97F4A7C15L

  /** KMV sketch hash of a string: finalized FNV-1a in [0, 2^63). */
  def kmvHash(s: UTF8String): Long = (fnv1a64(s) * KmvPhi) >>> 1

  /** LSH band keys straight from a shingle-hash array: `numHashes`
    * permutation minima (permutation i is `((2i+1)*h + 7i+13) % Mod`,
    * the `Dedup.hashA`/`hashB` family — parity pinned by OpsSpec) folded
    * into `bands` keys of `rows` values each with the rolling-hash
    * polynomial. One pass over the array, no per-permutation
    * materialization — the row-local fusion that makes MinHash banding
    * usable on a STREAM, where the batch path's explode+aggregate
    * (a shuffle) is unavailable and the naive 16× `transform` chain
    * re-evaluates its input per permutation. Empty input → empty keys
    * (docs below the shingle size drop out, like the batch filter). */
  def minhashBandKeys(hashes: ArrayData, numHashes: Int, bands: Int, rows: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = ((2L * j + 1) * h + (7L * j + 13)) % Mod
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var r = 0
      while (r < rows) { acc = (acc * 31 + mins(b * rows + r)) % Mod; r += 1 }
      keys(b) = acc
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** 64-bit SimHash over an array of tokens: per bit, sum +1/-1 weighted
    * by each token's FNV hash bit; result bit = sign of the sum.
    * Near-duplicate docs differ in few bits (compare via hamming
    * distance = bit_count(a ^ b)). */
  def simHash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** Binary media-container header parsing for generated code. */
object MediaUtil {
  /** Parse a PNG IHDR header (public spec: W3C PNG / RFC 2083).
    * Layout: bytes 0–7 the fixed signature 89 50 4E 47 0D 0A 1A 0A;
    * bytes 8–11 the first chunk's big-endian length (13 for IHDR);
    * bytes 12–15 the chunk type "IHDR"; then width (BE u32), height
    * (BE u32), bit depth (u8), color type (u8). Returns
    * (width, height, bit_depth, color_type) — or null unless the payload
    * starts with a well-formed IHDR (the decoder never throws on junk:
    * a corrupt blob in a 100 TB media corpus must filter, not fail the
    * job). The CRC is not validated — dimension extraction, not
    * integrity checking. */
  def pngIhdr(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 26) return null
    if ((bytes(0) & 0xff) != 0x89 || bytes(1) != 'P' || bytes(2) != 'N' ||
        bytes(3) != 'G' || bytes(4) != 0x0d || bytes(5) != 0x0a ||
        bytes(6) != 0x1a || bytes(7) != 0x0a) return null
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    if (be32(8) != 13L) return null
    if (bytes(12) != 'I' || bytes(13) != 'H' || bytes(14) != 'D' || bytes(15) != 'R')
      return null
    val w = be32(16)
    val h = be32(20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
    new GenericInternalRow(Array[Any](w.toInt, h.toInt, bytes(24) & 0xff, bytes(25) & 0xff))
  }
}

/** png_ihdr(binary): STRUCT<width INT, height INT, bit_depth INT,
  * color_type INT>, null for anything that is not a well-formed PNG
  * prefix — a REAL fixed-format media decoder as a codegen expression
  * (the multimodal path's proof that binary payload decoding runs
  * native in the scan pipeline; the full image decode stays behind the
  * documented stub because this container ships no codecs). */
case class PngIhdr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs BINARY, got ${child.dataType}")
  override def nullable: Boolean = true // junk bytes decode to null
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false),
    StructField("color_type", IntegerType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any =
    MediaUtil.pngIhdr(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaUtil.pngIhdr($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): PngIhdr =
    copy(child = newChild)
  override def prettyName: String = "graft_png_ihdr"
}

/** rolling_hash(text): LongType. Codegen-friendly (stays inside
  * whole-stage codegen via a static call — no UDF/serialization cost).
  * Oracle-equivalent in DuckDB: sequential (acc*31 + ascii) % 1e9+7 fold.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    HashUtil.rollingHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.rollingHash($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "graft_rolling_hash"
}

/** simhash64(array<string>): LongType document sketch for near-dup
  * detection (reference has no analogue; this is the training-data
  * pipeline extension — see SURVEY §7.1 ops/). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<STRING>, got $other")
  }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    HashUtil.simHash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.simHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash64"
}

/** Static vector helpers for generated code. */
object VectorUtil {
  /** Sequential-fold dot product over two double arrays — identical
    * IEEE evaluation order to `aggregate(zip_with(a,b,_*_), 0.0, _+_)`
    * and to the oracle's `list_reduce` fold, but with zero intermediate
    * allocation. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc = acc + a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Sequential-fold squared L2 distance — same IEEE order as the
    * oracle's `list_reduce` over `(a[i]-b[i])^2`, zero allocation. */
  def sqdist(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); acc = acc + d * d; i += 1 }
    acc
  }

  /** All banded-LSH keys of one vector in a SINGLE pass: plane i's dot
    * accumulates in j-ascending order (bit-identical to a per-plane
    * [[dot]] against the literal plane array — the fold order the oracle
    * restates), but the vector element is loaded once per j and fanned
    * across every plane accumulator, so bands×rows plane products cost
    * one traversal instead of bands×rows separate expression calls.
    * Plane formula: (i·97 + j·31) % 19 − 9, i = band·rows + row (the
    * same deterministic integers [[graft.ops.Similarity.plane]] and the
    * DuckDB oracle compute). */
  def lshBandKeys(v: ArrayData, dim: Int, bands: Int, rows: Int): ArrayData = {
    val np = bands * rows
    val n = math.min(dim, v.numElements())
    val acc = new Array[Double](np)
    var j = 0
    while (j < n) {
      val x = v.getDouble(j)
      val j31 = j * 31
      var i = 0
      while (i < np) {
        acc(i) = acc(i) + x * ((i * 97 + j31) % 19 - 9)
        i += 1
      }
      j += 1
    }
    val keys = new Array[Int](bands)
    var t = 0
    while (t < bands) {
      var key = 0
      var r = 0
      while (r < rows) {
        if (acc(t * rows + r) > 0) key |= 1 << r
        r += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }

  /** Intersection size of two ascending-sorted long arrays (merge scan). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** array_dot(array<double>, array<double>): DoubleType. The hot-loop
  * kernel for cosine similarity / ANN search: a native codegen binary
  * expression, so an all-pairs similarity join does one virtual call per
  * pair instead of building zip_with arrays. */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName needs two ARRAY<DOUBLE>, got $other")
    }
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtil.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_array_dot"
}

/** lsh_band_keys(array<double>, dim, bands, rows): ARRAY<INT>. Every
  * banded-LSH key of a vector as ONE fused codegen kernel — the
  * signature-generation hot loop of blocked near-dup dedup (dd10), where
  * the self-tuned geometry can demand hundreds of plane products per
  * vector: evaluated as separate array_dot calls they re-traverse the
  * vector per plane; fused, the vector streams once
  * ([[VectorUtil.lshBandKeys]], bit-identical fold order). */
case class LshBandKeys(child: Expression, dim: Int, bands: Int, rows: Int)
    extends UnaryExpression {
  require(dim > 0 && bands > 0 && rows > 0 && rows <= 31,
    s"lsh_band_keys needs positive dim/bands and rows in 1..31, got ($dim, $bands, $rows)")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<DOUBLE>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    VectorUtil.lshBandKeys(input.asInstanceOf[ArrayData], dim, bands, rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorUtil.lshBandKeys($c, $dim, $bands, $rows)")
  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
  override def prettyName: String = "graft_lsh_band_keys"
}

/** array_sqdist(array<double>, array<double>): DoubleType. Squared L2
  * distance as a native codegen kernel — the k-means/IVF assignment hot
  * loop, with none of the zip_with intermediate arrays. */
case class ArraySqDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName needs two ARRAY<DOUBLE>, got $other")
    }
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.sqdist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtil.sqdist($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySqDist =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_array_sqdist"
}

/** shingle_hash_set(array<string>, n): sorted distinct rolling hashes of
  * the word n-gram shingles (see HashUtil.shingleHashSet). The fused
  * kernel behind every shingle-based dedup operator. */
case class ShingleHashSet(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<STRING>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashUtil.shingleHashSet(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.shingleHashSet($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hash_set"
}

/** minhash_band_keys(array<bigint>): ArrayType(LongType) — fused
  * MinHash-signature + LSH-band-key kernel (see
  * [[HashUtil.minhashBandKeys]]). */
case class MinhashBandKeys(child: Expression, numHashes: Int, bands: Int,
    rows: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<BIGINT>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashUtil.minhashBandKeys(input.asInstanceOf[ArrayData], numHashes, bands, rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashUtil.minhashBandKeys($c, $numHashes, $bands, $rows)")
  override protected def withNewChildInternal(newChild: Expression): MinhashBandKeys =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_band_keys"
}

/** char_ngrams(string, n): ArrayType(StringType) — all character n-grams. */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashUtil.charNgrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.charNgrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
  override def prettyName: String = "graft_char_ngrams"
}

/** word_ngrams(string, n): ArrayType(StringType) — word n-grams with
  * repeats (tx06's repetition multiset). */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashUtil.wordNgrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.wordNgrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
  override def prettyName: String = "graft_word_ngrams"
}

/** count_in_set(array<string>; fixed set): IntegerType — marker-word /
  * stopword counting without an interpreted filter lambda. */
case class CountInSet(child: Expression, values: Seq[String]) extends UnaryExpression {
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<STRING>, got $other")
  }
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    HashUtil.countInSet(input.asInstanceOf[ArrayData], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.countInSet($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
  override def prettyName: String = "graft_count_in_set"
}

/** token_stats(string; fixed stopword set): STRUCT<tc INT, sc INT,
  * cl BIGINT, bpe BIGINT> — token count, stopword count, summed token
  * code-point length, and the chars/4 BPE-ish estimate, in ONE pass over
  * the raw bytes. The fused kernel behind tx01/tx02: the unfused form
  * re-splits the text once per metric and pays interpreted higher-order
  * folds. Deterministic, so whole-stage codegen's subexpression
  * elimination evaluates it once however many fields are read. */
case class TokenStats(child: Expression, stopwords: Seq[String]) extends UnaryExpression {
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stopwords.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }
  private val maxStopBytes: Int =
    if (stopwords.isEmpty) 0
    else stopwords.map(_.getBytes("UTF-8").length).max
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("tc", IntegerType, nullable = false),
    StructField("sc", IntegerType, nullable = false),
    StructField("cl", LongType, nullable = false),
    StructField("bpe", LongType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any =
    HashUtil.tokenStats(input.asInstanceOf[UTF8String], set, maxStopBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.tokenStats($c, $ref, $maxStopBytes)")
  }
  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
  override def prettyName: String = "graft_token_stats"
}

/** sorted_intersect_count(array<long>, array<long>): IntegerType.
  * Merge-count of the intersection of two ASCENDING-SORTED long arrays —
  * the zero-allocation kernel for set-similarity joins (Jaccard
  * verification): no per-pair hash set, no result array. Callers sort
  * once per row with `array_sort`. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName needs two ARRAY<BIGINT>, got $other")
    }
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtil.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_sorted_intersect_count"
}

/** kmv_hash(text): LongType in [0, 2^63) — the uniform sketch hash
  * feeding KmvDistinct (finalized FNV-1a; see HashUtil.kmvHash). */
case class KmvHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    HashUtil.kmvHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.kmvHash($c)")
  override protected def withNewChildInternal(newChild: Expression): KmvHash =
    copy(child = newChild)
  override def prettyName: String = "graft_kmv_hash"
}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate: the buffer is the k smallest DISTINCT hash values seen, the
  * estimate is (k-1) / u_k with u_k = kth-min / 2^63 — the classic KMV
  * estimator (Bar-Yossef et al., "Counting distinct elements in a data
  * stream", RANDOM 2002). Partial buffers merge by set-union-and-trim, so
  * a 100 TB scan ships at most k longs per partition over the exchange —
  * the constant-memory answer to COUNT(DISTINCT) at scale, and unlike
  * HyperLogLog the sketch is deterministic and exactly reproducible in
  * the DuckDB oracle (top-k over the same hash).
  *
  * Input must be a [0, 2^63) KmvHash value; result is a struct:
  * kth = the kth-smallest hash (0 when the group is empty), est = the
  * cardinality estimate (exact count when fewer than k distinct hashes).
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs BIGINT (a kmv_hash), got ${child.dataType}")
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("kth", LongType, nullable = false),
    StructField("est", DoubleType, nullable = false)))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { if (buf.add(h)) buf.remove(buf.last) }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { if (buf.add(h)) buf.remove(buf.last) }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size
    val kth = if (n == 0) 0L else buf.last.longValue()
    // (k-1) * 2^63 is exact in a double (8 significand bits, shifted);
    // the division then matches the oracle's BIGINT/DOUBLE divide bit
    // for bit. Fewer than k distinct hashes = the sketch IS the set.
    val est = if (n < k) n.toDouble else (k - 1).toDouble * 9.223372036854775808e18 / kth.toDouble
    new GenericInternalRow(Array[Any](kth, est))
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_kmv_distinct"
}

/** graft_kmv_sketch(hash, k): the KMV sketch ITSELF — the ≤ k smallest
  * distinct hash values, ascending — rather than [[KmvDistinct]]'s
  * finalized estimate. The sketch is a VALUE: it can be stored in a
  * per-partition/per-day rollup row and re-aggregated later by
  * exploding the arrays into a [[KmvDistinct]] over the union — and
  * because the global k-min set is contained in the union of per-group
  * k-min sets, the re-aggregated estimate EQUALS the single-pass
  * estimate exactly (the lossless-rollup property that makes sketches
  * the cardinality tool for pre-aggregated cubes at 100 TB; sk05 pins
  * the equality under the oracle). Same buffer, update, merge and
  * wire format as [[KmvDistinct]] — only eval differs. */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private val twin = KmvDistinct(child, k)

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
  override def checkInputDataTypes(): TypeCheckResult = twin.checkInputDataTypes()
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    twin.createAggregationBuffer()
  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = twin.update(buf, input)
  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    twin.merge(buf, other)
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    twin.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    twin.deserialize(bytes)

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_kmv_sketch"
}

/** Column-level entry points for the custom expressions. */
object exprs {
  def rolling_hash(c: Column): Column = Bridge.column(RollingHash(Bridge.expression(c)))
  def simhash64(tokens: Column): Column = Bridge.column(SimHash64(Bridge.expression(tokens)))
  def array_dot(a: Column, b: Column): Column =
    Bridge.column(ArrayDotProduct(Bridge.expression(a), Bridge.expression(b)))
  def array_sqdist(a: Column, b: Column): Column =
    Bridge.column(ArraySqDist(Bridge.expression(a), Bridge.expression(b)))
  def lsh_band_keys(v: Column, dim: Int, bands: Int, rows: Int): Column =
    Bridge.column(LshBandKeys(Bridge.expression(v), dim, bands, rows))
  def sorted_intersect_count(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
  def shingle_hash_set(tokens: Column, n: Int): Column =
    Bridge.column(ShingleHashSet(Bridge.expression(tokens), n))
  def minhash_band_keys(hashes: Column, numHashes: Int, bands: Int, rows: Int): Column =
    Bridge.column(MinhashBandKeys(Bridge.expression(hashes), numHashes, bands, rows))
  def char_ngrams(s: Column, n: Int): Column =
    Bridge.column(CharNgrams(Bridge.expression(s), n))
  def word_ngrams(s: Column, n: Int): Column =
    Bridge.column(WordNgrams(Bridge.expression(s), n))
  def count_in_set(tokens: Column, values: Seq[String]): Column =
    Bridge.column(CountInSet(Bridge.expression(tokens), values))
  def token_stats(text: Column, stopwords: Seq[String]): Column =
    Bridge.column(TokenStats(Bridge.expression(text), stopwords))
  def kmv_hash(c: Column): Column = Bridge.column(KmvHash(Bridge.expression(c)))
  def png_ihdr(payload: Column): Column = Bridge.column(PngIhdr(Bridge.expression(payload)))
  def kmv_distinct(hash: Column, k: Int): Column =
    Bridge.column(KmvDistinct(Bridge.expression(hash), k).toAggregateExpression())
  def kmv_sketch(hash: Column, k: Int): Column =
    Bridge.column(KmvSketch(Bridge.expression(hash), k).toAggregateExpression())
}
