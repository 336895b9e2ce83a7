package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `events.parquet` has shipped with two physical `ts` encodings across
  * testdata generations: TIMESTAMP(NANOS) (read as nanos LONG under
  * `nanosAsLong`) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
  * TIMESTAMP_NTZ). [[Tables.events]] must normalize BOTH to the same view
  * (`ts_ns`/`ts_us` BIGINT + µs TimestampType `ts`) — round 6 lost all 18
  * events bench dims and the whole correctness record to a regeneration
  * that switched encodings mid-stream.
  */
class EventsSchemaSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, 1700000000123456L, 7L, "click", 1.5, """{"k":1}"""),
    (2L, 1700000777000001L, 8L, "purchase", 2.5, """{"k":2}"""),
    (3L, 1700001234999999L, 7L, "signup", 0.0, """{"k":3}"""))

  private def writeMicros(dir: String): Unit =
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(dir)

  private def writeNanosAsLong(dir: String): Unit =
    // The nanos encoding arrives in Spark as a LONG column named `ts`
    // (parquet TIMESTAMP(NANOS) + nanosAsLong). Writing a plain LONG
    // reproduces exactly what the reader sees.
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), (col("us") * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(dir)

  test("micros-timestamp and nanos-long encodings normalize to the identical view") {
    val base = tmpDir("events-schema")
    writeMicros(s"$base/m/events.parquet")
    writeNanosAsLong(s"$base/n/events.parquet")

    val m = Tables.events(spark, s"$base/m")
    val n = Tables.events(spark, s"$base/n")

    for (df <- Seq(m, n)) {
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.schema("ts_us").dataType == LongType)
      assert(df.schema("ts_ns").dataType == LongType)
    }

    val cols = Seq("event_id", "ts_us", "ts_ns", "user_id", "event_type", "value", "props")
    val mRows = m.select(cols.map(col): _*).orderBy("event_id").collect().toSeq
    val nRows = n.select(cols.map(col): _*).orderBy("event_id").collect().toSeq
    assert(mRows == nRows)

    // exact micros survive (no double-rounding anywhere in the path)
    assert(m.orderBy("event_id").select("ts_us").as[Long].collect().toSeq ==
      Seq(1700000000123456L, 1700000777000001L, 1700001234999999L))
    // the µs TimestampType column agrees with ts_us under the UTC session
    assert(m.select(count(when(unix_micros(col("ts")) =!= col("ts_us"), 1))).as[Long].head() == 0L)
  }

  test("the real testdata events table loads with the normalized schema") {
    val df = Tables.events(spark, sf())
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("ts_us").dataType == LongType)
    assert(df.select(count(when(col("ts_ns") =!= col("ts_us") * 1000L, 1))).as[Long].head() == 0L)
    assert(df.count() > 0)
  }
}
