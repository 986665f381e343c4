package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each call is a plain parquet scan: Catalyst pushes filters and prunes
  * columns into the scan, so callers can compose freely without caching.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark 4
    * cannot infer (`PARQUET_TYPE_ILLEGAL`). Every reader of the table —
    * batch or stream — must supply this schema, which reads ts as the raw
    * epoch-nanos int64. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // epoch nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Converts the raw epoch-nanos `ts` column to a microsecond
    * TimestampType (truncating, matching DuckDB's micro-precision read of
    * the same files) — shared by the batch loader and the streaming
    * queries so the ns→us rule has exactly one definition. */
  def tsNanosToMicros(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  /** Events with `ts` as a microsecond TimestampType — the schema the
    * plain inferred read would have produced were the file not NANOS. */
  def events(s: SparkSession, d: String): DataFrame =
    tsNanosToMicros(eventsRawNanos(s, d))

  /** Events with `ts` as the raw epoch-nanos int64, for consumers doing
    * exact integer time arithmetic. */
  def eventsRawNanos(s: SparkSession, d: String): DataFrame =
    s.read.schema(eventsSchema).parquet(s"$d/events.parquet")
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
