package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each call is a plain parquet scan: Catalyst pushes filters and prunes
  * columns into the scan, so callers can compose freely without caching.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events parquet's `ts` physical unit has varied across driver
    * generations: INT64 TIMESTAMP(NANOS) — which Spark 4 cannot infer
    * (`PARQUET_TYPE_ILLEGAL`) or read as a timestamp — and INT64
    * TIMESTAMP(MICROS), which the plain inferred read handles natively.
    * Guessing wrong is silent and catastrophic: a NANOS-era reader
    * applied to a MICROS file divides microseconds by 1000 and every
    * event lands in 1970 at millisecond resolution. So the loaders sniff
    * the unit ONCE per directory from the file footer ([[eventsTsIsMicros]])
    * and normalize to a microsecond TimestampType either way; every
    * consumer — batch or stream — sees one schema regardless of
    * generation.
    *
    * This schema reads `ts` as the raw int64 (the NANOS-era fallback,
    * where a timestamp read is impossible). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // raw int64 epoch nanos (legacy files)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** True when the events file under `dir` stores ts as TIMESTAMP(MICROS):
    * schema inference then yields a timestamp type (TimestampNTZType for
    * the driver's isAdjustedToUTC=false files, TimestampType were they
    * UTC-adjusted). For the legacy TIMESTAMP(NANOS) layout inference
    * throws `PARQUET_TYPE_ILLEGAL` instead. One footer read per directory
    * per JVM (a driver-side metadata op — the data dirs are immutable). */
  def eventsTsIsMicros(s: SparkSession, dir: String): Boolean = {
    val path = s"$dir/events.parquet"
    Option(tsUnitCache.get(path)).map(_.booleanValue).getOrElse {
      // Only the EXPECTED inference failure (the NANOS layout's
      // PARQUET_TYPE_ILLEGAL) selects the legacy path; anything else —
      // missing file, transient FS error — propagates instead of being
      // cached as "legacy" and silently mis-timing every later read.
      val isMicros =
        try s.read.parquet(path).schema("ts").dataType match {
          case TimestampType | TimestampNTZType => true
          // Any other inferred type (e.g. a future generation writing
          // unannotated plain INT64 → LongType) means the unit is UNKNOWN:
          // fail loudly rather than guess a conversion factor and silently
          // mis-time every event.
          case other => throw new IllegalStateException(
            s"events.parquet at $path: ts inferred as $other — expected a " +
            "timestamp type (MICROS layout) or the NANOS inference failure; " +
            "refusing to guess the epoch unit")
        } catch {
          // Only the EXACT known failure mode of the NANOS layout selects
          // the legacy div-1000 path; an unrelated AnalysisException whose
          // message merely mentions parquet must propagate.
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "PARQUET_TYPE_ILLEGAL" => false
        }
      tsUnitCache.put(path, java.lang.Boolean.valueOf(isMicros))
      isMicros
    }
  }

  private val tsUnitCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Converts the raw int64 `ts` column to a microsecond TimestampType:
    * identity reinterpretation for MICROS files, a truncating div 1000
    * for legacy NANOS files (matching DuckDB's micro-precision read of
    * the same files). Both units flow through the raw-int64 read + this
    * one conversion — never through Spark's timestamp inference — so the
    * result is byte-identical regardless of session timezone or the
    * file's isAdjustedToUTC flag. */
  def tsRawToMicros(df: DataFrame, isMicros: Boolean): DataFrame =
    df.withColumn("ts",
      timestamp_micros(if (isMicros) col("ts") else expr("ts div 1000")))

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  /** Events with `ts` as a microsecond TimestampType, whichever unit the
    * file stores (see [[eventsSchema]]'s scaladoc for the sniff). */
  def events(s: SparkSession, d: String): DataFrame =
    tsRawToMicros(
      s.read.schema(eventsSchema).parquet(s"$d/events.parquet"),
      eventsTsIsMicros(s, d))
  /** Documents schema, for consumers that cannot infer (file streams). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
