package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver's TPC-H-ish testdata
  * (`/root/repo/TESTDATA.md`). All query entry points read through here so
  * schema quirks are fixed in exactly one place.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.parquet` has shipped with two physical `ts` encodings across
    * testdata generations, so the loader adapts on the footer schema and
    * always exposes the same normalized view:
    *   - `ts_ns`: nanos-since-epoch BIGINT (exact where the source carries
    *     nanos; micros*1000 otherwise)
    *   - `ts_us`: micros-since-epoch BIGINT (always exact; `DIV`, not `/`,
    *     because double division loses precision above 2^53)
    *   - `ts`: TimestampType at microsecond precision (Spark's native max)
    *
    * Encodings seen: parquet TIMESTAMP(NANOS), which with
    * `spark.sql.legacy.parquet.nanosAsLong=true` arrives as LONG; and
    * parquet TIMESTAMP(MICROS, isAdjustedToUTC=false), which arrives as
    * TIMESTAMP_NTZ — cast through TimestampType under the session's UTC
    * timezone, matching DuckDB's naive `epoch_us(ts)` in the oracle SQL.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns DIV 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case _ =>
        raw
          .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("ts_ns", col("ts_us") * lit(1000L))
    }
  }
}
