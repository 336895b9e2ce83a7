package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class SsEvent(dim_id: Long, value: Double)

/** Stream-static enrichment: micro-batches join a static dimension frame
  * with left semantics (unmatched events survive with NULL dims).
  */
@graft.SlowTest
class StreamStaticJoinSpec extends SparkSpec {

  test("events are enriched per batch; unmatched keys keep NULL dims") {
    import spark.implicits._
    val dims = Seq((1L, "gold"), (2L, "silver")).toDF("dim_id", "tier")
    val input = MemoryStream[SsEvent](spark)
    val q = EventStreams.enrichWithDims(input.toDF(), dims, "dim_id")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    input.addData(Seq(SsEvent(1L, 10.0), SsEvent(3L, 30.0)))
    q.processAllAvailable()
    input.addData(Seq(SsEvent(2L, 20.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enriched")
      .collect().map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet
    assert(rows == Set((1L, 10.0, Some("gold")), (3L, 30.0, None), (2L, 20.0, Some("silver"))))
  }
}
