package graft.pointcloud.las.laz

/** Scratch generator for the golden-byte pins in LazCodecSpec — run once
  * after an INTENTIONAL bitstream change and paste its output into the
  * spec. (`Test/runMain graft.pointcloud.las.laz.LazGoldenPin`) */
object LazGoldenPin {
  def records(format: Byte, extra: Int, count: Int): Array[Byte] = {
    val items = LazFile.itemsFor(format, extra)
    val stride = items.map(_.size).sum
    val rnd = new scala.util.Random(31013)
    val out = new Array[Byte](count * stride)
    val wave = new WaveChain
    var x = 100000; var y = 2000000; var z = 50; var t = 123456.789
    var i = 0
    while (i < count) {
      val off = i * stride
      // scan-shaped: mostly small deltas, occasional jumps, cyclic returns
      if (i % 101 == 0) { x += rnd.nextInt(1 << 18) - (1 << 17); y -= rnd.nextInt(1 << 16) }
      else { x += rnd.nextInt(50) - 20; y += rnd.nextInt(9) - 4 }
      z += rnd.nextInt(7) - 3
      LazItemCodec.putI32(out, off, x)
      LazItemCodec.putI32(out, off + 4, y)
      LazItemCodec.putI32(out, off + 8, z)
      LazItemCodec.putU16(out, off + 12, rnd.nextInt(3000))
      val r = 1 + rnd.nextInt(4)
      val n = math.max(r, 1 + rnd.nextInt(4))
      out(off + 14) = ((r & 7) | ((n & 7) << 3) | (rnd.nextInt(2) << 6)).toByte
      out(off + 15) = rnd.nextInt(32).toByte
      out(off + 16) = rnd.nextInt(256).toByte
      out(off + 17) = rnd.nextInt(4).toByte
      LazItemCodec.putU16(out, off + 18, 17)
      var p = off + 20
      if (format == 1 || format == 3 || format == 4 || format == 5) {
        t += (if (i % 7 == 0) 0.0 else 0.001 * (1 + rnd.nextInt(3)))
        LazItemCodec.putI64(out, p, java.lang.Double.doubleToLongBits(t))
        p += 8
      }
      if (format == 2 || format == 3 || format == 5) {
        val gray = rnd.nextInt(3) == 0
        val rr = rnd.nextInt(1 << 16)
        LazItemCodec.putU16(out, p, rr)
        LazItemCodec.putU16(out, p + 2, if (gray) rr else rnd.nextInt(1 << 16))
        LazItemCodec.putU16(out, p + 4, if (gray) rr else rnd.nextInt(1 << 16))
        p += 6
      }
      if (format == 4 || format == 5) { p = fillWave(out, p, rnd, wave) }
      var e = 0
      while (e < extra) { out(p + e) = rnd.nextInt(256).toByte; e += 1 }
      i += 1
    }
    out
  }

  /** Mutable per-stream waveform chain: (offset, size) so the "directly
    * following" classification actually fires on scan-shaped data. */
  private final class WaveChain {
    var offset = 1000000L
    var size = 0
  }
  /** Scan-shaped wavepacket tail: packets mostly follow each other in
    * the waveform file (sym 1), sometimes repeat (sym 0), sometimes jump
    * within i32 (sym 2), rarely jump past it (sym 3). */
  private def fillWave(out: Array[Byte], p: Int, rnd: scala.util.Random,
      st: WaveChain): Int = {
    out(p) = (1 + rnd.nextInt(3)).toByte
    rnd.nextInt(19) match {
      case 0 => // repeat the previous packet
      case 17 => st.offset += (1L << 33) + rnd.nextInt(1 << 20) // raw 64-bit jump
      case 18 => st.offset -= rnd.nextInt(1 << 24) // i32-diff jump (backwards)
      case _ => st.offset += st.size // directly following
    }
    if (rnd.nextInt(5) != 0) st.size = 64 + 8 * rnd.nextInt(200)
    LazItemCodec.putI64(out, p + 1, st.offset)
    LazItemCodec.putI32(out, p + 9, st.size)
    LazItemCodec.putI32(out, p + 13,
      java.lang.Float.floatToIntBits(12.5f + rnd.nextInt(40) * 0.25f))
    LazItemCodec.putI32(out, p + 17, java.lang.Float.floatToIntBits(0.001f * rnd.nextInt(100)))
    LazItemCodec.putI32(out, p + 21, java.lang.Float.floatToIntBits(0.001f * rnd.nextInt(100)))
    LazItemCodec.putI32(out, p + 25, java.lang.Float.floatToIntBits(-0.999f))
    p + 29
  }

  def sha256(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"${b & 0xFF}%02x").mkString

  def hex(bytes: Array[Byte], n: Int): String =
    bytes.take(n).map(b => f"${b & 0xFF}%02x").mkString

  /** Deterministic scan-shaped LAS 1.4 records for the layered families:
    * two interleaved scanner channels, extended 4-bit returns, i16
    * angles, per-channel time bases. */
  def records14(format: Byte, extra: Int, count: Int): Array[Byte] = {
    val items = LazFile.itemsFor(format, extra)
    val stride = items.map(_.size).sum
    val rnd = new scala.util.Random(47111)
    val out = new Array[Byte](count * stride)
    val waves = Array.fill(2)(new WaveChain)
    val xs = Array(100000, 600000); val ys = Array(2000000, 1900000)
    val zs = Array(50, 60); val ts = Array(123456.789, 900000.125)
    var i = 0
    while (i < count) {
      val off = i * stride
      val ch = if (rnd.nextInt(11) == 0) rnd.nextInt(2) else i % 2
      if (i % 101 == 0) { xs(ch) += rnd.nextInt(1 << 18) - (1 << 17); ys(ch) -= rnd.nextInt(1 << 16) }
      else { xs(ch) += rnd.nextInt(50) - 20; ys(ch) += rnd.nextInt(9) - 4 }
      zs(ch) += rnd.nextInt(7) - 3
      ts(ch) += (if (i % 6 == 0) 0.0 else 0.0005 * (1 + rnd.nextInt(4)))
      LazItemCodec.putI32(out, off, xs(ch))
      LazItemCodec.putI32(out, off + 4, ys(ch))
      LazItemCodec.putI32(out, off + 8, zs(ch))
      LazItemCodec.putU16(out, off + 12, rnd.nextInt(3000))
      val r = 1 + rnd.nextInt(9)
      val n = math.max(r, 1 + rnd.nextInt(9))
      out(off + 14) = ((r & 0xF) | ((n & 0xF) << 4)).toByte
      out(off + 15) = ((rnd.nextInt(16)) | (ch << 4) | (rnd.nextInt(2) << 6) | (rnd.nextInt(2) << 7)).toByte
      out(off + 16) = rnd.nextInt(64).toByte
      out(off + 17) = rnd.nextInt(4).toByte
      LazItemCodec.putU16(out, off + 18, (rnd.nextInt(3600) - 1800) & 0xFFFF)
      LazItemCodec.putU16(out, off + 20, 17)
      LazItemCodec.putI64(out, off + 22, java.lang.Double.doubleToLongBits(ts(ch)))
      var p = off + 30
      if (format == 7 || format == 8 || format == 10) {
        val gray = rnd.nextInt(3) == 0
        val rr = rnd.nextInt(1 << 16)
        LazItemCodec.putU16(out, p, rr)
        LazItemCodec.putU16(out, p + 2, if (gray) rr else rnd.nextInt(1 << 16))
        LazItemCodec.putU16(out, p + 4, if (gray) rr else rnd.nextInt(1 << 16))
        p += 6
      }
      if (format == 8 || format == 10) {
        LazItemCodec.putU16(out, p, rnd.nextInt(1 << 12)); p += 2
      }
      if (format == 9 || format == 10) { p = fillWave(out, p, rnd, waves(ch)) }
      var e = 0
      while (e < extra) { out(p + e) = rnd.nextInt(256).toByte; e += 1 }
      i += 1
    }
    out
  }

  def main(args: Array[String]): Unit = {
    for ((format, extra) <- Seq((0, 0), (1, 0), (2, 0), (3, 5), (5, 0))) {
      val items = LazFile.itemsFor(format.toByte, extra)
      val stride = items.map(_.size).sum
      val recs = records(format.toByte, extra, 2000)
      val chunk = LazFile.encodeChunk(LazFile.codecsFor(items), recs, 0, 2000, stride)
      println(s"""("fmt$format-extra$extra", ${chunk.length}, "${sha256(chunk)}", "${hex(chunk, 16)}"),""")
    }
    for ((format, extra) <- Seq((6, 0), (7, 0), (8, 3), (9, 0))) {
      val items = LazFile.itemsFor(format.toByte, extra)
      val stride = items.map(_.size).sum
      val recs = records14(format.toByte, extra, 2000)
      val chunk = LazFile.encodeChunkLayered(LazFile.codecsLayeredFor(items), recs, 0, 2000, stride)
      println(s"""("fmt$format-extra$extra", ${chunk.length}, "${sha256(chunk)}", "${hex(chunk, 16)}"),""")
    }
    val table = LazFile.chunkTableBytes(Seq(52341L, 49877L, 51002L, 1203L))
    println(s"""table: ${table.length}, "${sha256(table)}", "${hex(table, 16)}"""")
  }
}
