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

  /** `events.parquet` carries parquet TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` the `ts` column arrives as
    * nanos-since-epoch LONG. Expose:
    *   - `ts_ns`: raw nanos (exact)
    *   - `ts_us`: micros via integer division (exact; `DIV`, not `/`, because
    *     double division loses precision above 2^53)
    *   - `ts`: TimestampType at microsecond precision (Spark's native max)
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", expr("ts_ns DIV 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
}
