package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, processed in partition-local batches.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[stubDecodeFeatures]]) — but the
  * Spark-side contract is real and tested: schema shape, payload packing,
  * batch partitioning, and the feature-extraction column pipeline are
  * exactly what a real decoder (a Pandas-UDF `mapInPandas` or a JNI
  * batch decoder) would slot into.
  */
object Multimodal {

  /** Schema contract: payload binary + (kind, source, byte_len) metadata. */
  def packPayload(df: DataFrame, contentCol: String, kind: String,
      sourceCol: String): DataFrame =
    df.withColumn("payload", col(contentCol).cast("binary"))
      .withColumn("media_meta", struct(
        lit(kind).as("kind"),
        col(sourceCol).as("source"),
        octet_length(col("payload")).as("byte_len")))

  /** STUB decoder ??? — stands in for the real image/audio decode, which
    * is not available in this environment. Deterministic features from
    * the raw bytes so the plumbing is end-to-end testable:
    *   byte_len, head_sum (sum of the first 16 byte values), and a
    *   4-bin byte histogram of the first 64 bytes.
    * A real deployment replaces this single function with the actual
    * decoder (same signature: binary column → feature columns).
    */
  def stubDecodeFeatures(payload: Column): Column = {
    val head = (n: Int) =>
      transform(sequence(lit(1), least(octet_length(payload), lit(n))),
        i => ascii(payload.cast("string").substr(i, lit(1))))
    val headSum = aggregate(head(16), lit(0L), (acc, x) => acc + x)
    val hist = (0 until 4).map { b =>
      size(filter(head(64), x => shiftright(x, 6) === b)).as(s"hist$b")
    }
    struct(
      octet_length(payload).as("byte_len") +:
      headSum.as("head_sum") +:
      hist: _*)
  }

  /** Frame/sample selection stub: pick every `stride`-th unit — the shape
    * of video frame-sampling, expressed on the row axis. */
  def sampleEvery(df: DataFrame, idCol: String, stride: Int): DataFrame =
    df.filter(col(idCol) % stride === 0)

  /** Big-endian u32 as 8 hex nibbles (Spark `hex` drops leading zeros). */
  private def hex8(c: Column): Column = lpad(hex(c.cast("int")), 8, "0")

  /** A well-formed PNG signature + IHDR prefix built from dimension
    * columns — the encode twin of the [[graft.functions.PngIhdr]]
    * decoder, used by mm03 to run real header decoding through a
    * deterministic payload the DuckDB oracle can restate arithmetically.
    * The trailing CRC is zeroed (the decoder extracts dimensions, it
    * does not integrity-check). */
  def pngIhdrBytes(width: Column, height: Column, bitDepth: Column,
      colorType: Column): Column =
    unhex(concat(
      lit("89504E470D0A1A0A"), // PNG signature
      lit("0000000D"),         // IHDR chunk length = 13
      lit("49484452"),         // "IHDR"
      hex8(width), hex8(height),
      // masked to the field width: Spark lpad KEEPS THE FIRST len chars of
      // an over-long string, so an unmasked out-of-range value would
      // silently encode its top nibbles instead of erroring
      lpad(hex(bitDepth.cast("int").bitwiseAND(lit(0xff))), 2, "0"),
      lpad(hex(colorType.cast("int").bitwiseAND(lit(0xff))), 2, "0"),
      lit("000000"),           // compression, filter, interlace
      lit("00000000")))        // CRC (zeroed)

  case class DecodedFeatures(id: Long, byte_len: Int, head_sum: Long)

  /** The real decoder seam: payloads stream through partition-local
    * batches of `batchSize`, and the whole batch is handed to the decode
    * function at once — exactly where a vectorized image/audio decoder
    * (ONNX/JNI, or Python's mapInPandas on the PySpark side) amortizes
    * its per-call cost. The default decoder is the same deterministic
    * STUB as [[stubDecodeFeatures]] (this container has no codecs), so
    * batch boundaries provably never change values — pinned by test.
    */
  def decodeInBatches(
      df: DataFrame, idCol: String, payloadCol: String, batchSize: Int,
      decode: Seq[(Long, Array[Byte])] => Seq[DecodedFeatures] = stubBatchDecode)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(batchSize > 0, "batchSize must be positive")
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(decode))
      .toDF()
  }

  /** STUB batch decoder ??? — per-item features identical to
    * [[stubDecodeFeatures]]'s byte_len/head_sum, computed batch-at-a-time. */
  def stubBatchDecode(batch: Seq[(Long, Array[Byte])]): Seq[DecodedFeatures] =
    batch.map { case (id, bytes) =>
      val head = bytes.take(16).map(b => (b & 0xff).toLong).sum
      DecodedFeatures(id, bytes.length, head)
    }
}
