package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class PEvent(ts: Timestamp, event_type: String, user_id: Long, value: Double)

/** Streaming/batch parity: replaying the real events table (sf0.001)
  * through the streaming transforms in arrival order produces exactly the
  * batch results — the property that makes the oracle-checked batch
  * operators (graft.operators.Events) pin the streaming semantics too.
  */
@graft.SlowTest
class StreamBatchParitySpec extends SparkSpec {

  test("streaming hourly counts over a replay == batch groupBy") {
    import spark.implicits._
    val rows = Tables.events(spark, sf())
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
      .as[PEvent].collect().toSeq

    val input = MemoryStream[PEvent](spark)
    val q = EventStreams.hourlyCounts(input.toDF(), watermark = "100 days")
      .writeStream.format("memory").queryName("parity_hourly")
      .outputMode("complete").start()
    // replay in two chunks to force multiple micro-batches
    val (a, b) = rows.splitAt(rows.size / 2)
    input.addData(a); q.processAllAvailable()
    input.addData(b); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("parity_hourly")
      .select(unix_timestamp(col("wstart")).as("h"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    val batch = Tables.events(spark, sf())
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    assert(streamed == batch)
  }
}
