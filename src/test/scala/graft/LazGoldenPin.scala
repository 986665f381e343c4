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
      if (format == 1 || format == 3) {
        t += (if (i % 7 == 0) 0.0 else 0.001 * (1 + rnd.nextInt(3)))
        LazItemCodec.putI64(out, p, java.lang.Double.doubleToLongBits(t))
        p += 8
      }
      if (format == 2 || format == 3) {
        val gray = rnd.nextInt(3) == 0
        val rr = rnd.nextInt(1 << 16)
        LazItemCodec.putU16(out, p, rr)
        LazItemCodec.putU16(out, p + 2, if (gray) rr else rnd.nextInt(1 << 16))
        LazItemCodec.putU16(out, p + 4, if (gray) rr else rnd.nextInt(1 << 16))
        p += 6
      }
      var e = 0
      while (e < extra) { out(p + e) = rnd.nextInt(256).toByte; e += 1 }
      i += 1
    }
    out
  }

  def sha256(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"${b & 0xFF}%02x").mkString

  def hex(bytes: Array[Byte], n: Int): String =
    bytes.take(n).map(b => f"${b & 0xFF}%02x").mkString

  def main(args: Array[String]): Unit = {
    for ((format, extra) <- Seq((0, 0), (1, 0), (2, 0), (3, 5))) {
      val items = LazFile.itemsFor(format.toByte, extra)
      val stride = items.map(_.size).sum
      val recs = records(format.toByte, extra, 2000)
      val chunk = LazFile.encodeChunk(LazFile.codecsFor(items), recs, 0, 2000, stride)
      println(s"""("fmt$format-extra$extra", ${chunk.length}, "${sha256(chunk)}", "${hex(chunk, 16)}"),""")
    }
    val table = LazFile.chunkTableBytes(Seq(52341L, 49877L, 51002L, 1203L))
    println(s"""table: ${table.length}, "${sha256(table)}", "${hex(table, 16)}"""")
  }
}
