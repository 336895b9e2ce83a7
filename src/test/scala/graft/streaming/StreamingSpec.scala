package graft.streaming

import graft.SparkSpec
import graft.core.{VectorStore, VectorTable}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

case class SRec(name: String, n: Long)
case class SEvent(ts: Timestamp, event_type: String, user_id: Long, value: Double)

/** Structured Streaming semantics: micro-batch ingest into VectorTable with
  * dense rowids across batches; watermarked windows dropping late data;
  * mapGroupsWithState running totals.
  */
@graft.SlowTest
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("foreachBatch ingest: arrival order, dense rowids, O(1) len between batches") {
    import spark.implicits._
    val input = MemoryStream[SRec](spark)
    val root = tmpDir("stream-ingest")
    val table = VectorTable.create(spark, root)
    val q = StreamIngest.start(input.toDF(), table, tmpDir("ckpt"))

    input.addData((0 until 30).map(i => SRec(s"a$i", i.toLong)))
    q.processAllAvailable()
    // committed data readable between micro-batches, O(1) manifest length
    assert(table.length == 30L)

    input.addData((30 until 50).map(i => SRec(s"b$i", i.toLong)))
    q.processAllAvailable()
    q.stop()

    assert(table.length == 50L)
    val store = VectorStore.open[SRec](spark, root)
    assert(store.getall().get.map(_.n) == (0L until 50L)) // dense + ordered
  }

  test("watermark drops late events beyond the delay (hourlyCounts)") {
    import spark.implicits._
    val input = MemoryStream[SEvent](spark)
    val counts = EventStreams.hourlyCounts(input.toDF(), watermark = "10 minutes")
    val q = counts.writeStream.format("memory").queryName("hourly")
      .outputMode("update").start()

    // Batch 1: one event in the 10:00 hour window.
    input.addData(SEvent(ts(5), "click", 1, 1.0))
    q.processAllAvailable()
    // Batch 2: event at 12:30 advances the watermark to 12:20, past the
    // 10:00 window's END (11:00) → that window's state is evicted.
    input.addData(SEvent(Timestamp.valueOf("2026-01-01 12:30:00"), "click", 1, 1.0))
    q.processAllAvailable()
    // Batch 3: a late event inside the evicted window is dropped (late-data
    // semantics: dropped only once window.end < watermark).
    input.addData(SEvent(ts(10), "click", 1, 1.0))
    q.processAllAvailable()
    q.stop()

    val byWindow = spark.table("hourly")
      .groupBy("wstart").agg(max("n").as("n")).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(byWindow(Timestamp.valueOf("2026-01-01 10:00:00")) == 1L)
    assert(byWindow(Timestamp.valueOf("2026-01-01 12:00:00")) == 1L)
  }

  test("session windows merge events within the gap, split beyond it") {
    import spark.implicits._
    val input = MemoryStream[SEvent](spark)
    val sessions = EventStreams.userSessions(input.toDF(), watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()

    // user 7: events at 10:00, 10:05 (same session), 10:30 (new session)
    input.addData(SEvent(ts(0), "e", 7, 1.0), SEvent(ts(5), "e", 7, 1.0), SEvent(ts(30), "e", 7, 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sess").where(col("user_id") === 7).collect()
    assert(rows.length == 2)
    val ns = rows.map(_.getAs[Long]("n")).sorted.toSeq
    assert(ns == Seq(1L, 2L))
  }

  test("streaming dedup drops duplicates within the watermark horizon") {
    import spark.implicits._
    val input = MemoryStream[SEvent](spark)
    val deduped = EventStreams.dedupStream(input.toDF(), Seq("user_id", "event_type"))
    val q = deduped.writeStream.format("memory").queryName("dedup_s")
      .outputMode("append").start()

    input.addData(SEvent(ts(1), "click", 1, 1.0), SEvent(ts(1), "click", 1, 2.0)) // dup key+ts
    q.processAllAvailable()
    input.addData(SEvent(ts(1), "click", 1, 3.0)) // late duplicate, same batch horizon
    q.processAllAvailable()
    input.addData(SEvent(ts(2), "click", 1, 4.0)) // new ts → kept
    q.processAllAvailable()
    q.stop()

    val n = spark.table("dedup_s").count()
    assert(n == 2) // one per distinct (user, type, ts)
  }

  test("stream-stream join matches purchases within the hour after a click") {
    import spark.implicits._
    val clicks = MemoryStream[SEvent](spark)
    val purchases = MemoryStream[SEvent](spark)
    val joined = EventStreams.clickToPurchaseJoin(clicks.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()

    clicks.addData(SEvent(ts(0), "click", 1, 0.0), SEvent(ts(0), "click", 2, 0.0))
    purchases.addData(
      SEvent(ts(30), "purchase", 1, 9.99),                              // within 1h → match
      SEvent(Timestamp.valueOf("2026-01-01 12:30:00"), "purchase", 2, 5.0)) // 2.5h later → no match
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ss_join").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("c_user") == 1L)
    assert(rows.head.getAs[Double]("p_value") == 9.99)
  }

  test("auto-compaction keeps a long-running ingest's batch count bounded") {
    import spark.implicits._
    val input = MemoryStream[SRec](spark)
    val table = VectorTable.create(spark, tmpDir("stream-autocompact") + "/t")
    val q = StreamIngest.start(input.toDF(), table, tmpDir("ckpt-ac"),
      compactEvery = 2)

    (0 until 6).foreach { b =>
      input.addData((0 until 10).map(i => SRec(s"b$b-$i", b * 10L + i)))
      q.processAllAvailable()
    }
    q.stop()

    assert(table.length == 60L)
    // without compaction this would be 6 batch dirs; auto-compact folds them
    assert(table.manifest.batches.size < 6,
      s"expected compaction to bound batches, got ${table.manifest.batches}")
    // data intact, rowids dense and in arrival order
    val store = VectorStore.open[SRec](spark, table.root)
    assert(store.getall().get.map(_.n) == (0L until 60L))
  }

  test("dropDuplicatesWithinWatermark dedups on the key alone across micro-batches") {
    import spark.implicits._
    val input = MemoryStream[SEvent](spark)
    val deduped = EventStreams.dedupKeysWithinWatermark(
      input.toDF(), Seq("user_id", "event_type"))
    val q = deduped.writeStream.format("memory").queryName("dd_wm")
      .outputMode("append").start()

    // same (user, type) at DIFFERENT event times — still duplicates
    input.addData(SEvent(ts(0), "click", 1, 1.0), SEvent(ts(5), "click", 1, 2.0))
    q.processAllAvailable()
    input.addData(SEvent(ts(10), "click", 1, 3.0), SEvent(ts(10), "view", 1, 4.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("dd_wm").collect()
    assert(rows.count(_.getAs[String]("event_type") == "click") == 1,
      s"key-only dedup must keep one click: ${rows.mkString(";")}")
    assert(rows.count(_.getAs[String]("event_type") == "view") == 1)
    // first occurrence wins
    assert(rows.find(_.getAs[String]("event_type") == "click").get.getAs[Double]("value") == 1.0)
  }

  test("stream-stream LEFT OUTER join emits unmatched clicks once the watermark closes their window") {
    import spark.implicits._
    val clicks = MemoryStream[SEvent](spark)
    val purchases = MemoryStream[SEvent](spark)
    val joined = EventStreams.clickToPurchaseLeftJoin(clicks.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory").queryName("ss_left_join")
      .outputMode("append").start()

    clicks.addData(SEvent(ts(0), "click", 1, 0.0), SEvent(ts(0), "click", 2, 0.0))
    purchases.addData(SEvent(ts(30), "purchase", 1, 9.99))
    q.processAllAvailable()
    // user 2's window (10:00 + 1h join range + 30m watermark) is still
    // open — no NULL row may be emitted yet (a match could still arrive)
    assert(spark.table("ss_left_join").where(col("p_user").isNull).count() == 0)

    // advance both watermarks past 11:30 (outer rows flush on a subsequent
    // trigger, so feed advancing batches until the NULL row lands)
    var hour = 14
    while (hour < 18 && spark.table("ss_left_join").where(col("p_user").isNull).count() == 0) {
      val t = Timestamp.valueOf(f"2026-01-01 $hour%02d:00:00")
      clicks.addData(SEvent(t, "click", 100 + hour, 0.0))
      purchases.addData(SEvent(t, "purchase", 100 + hour, 1.0))
      q.processAllAvailable()
      hour += 1
    }
    q.stop()

    val rows = spark.table("ss_left_join").collect()
    val nulls = rows.filter(_.getAs[Any]("p_user") == null).map(_.getAs[Long]("c_user"))
    assert(nulls.contains(2L), s"expected unmatched click for user 2, got ${rows.mkString(";")}")
    assert(nulls.count(_ == 2L) == 1, "NULL-side row must be emitted exactly once")
    // the matched click must NOT also appear as a NULL row
    assert(!nulls.contains(1L))
    assert(rows.count(r => r.getAs[Long]("c_user") == 1L && r.getAs[Any]("p_user") != null) == 1)
  }

  test("mapGroupsWithState accumulates running totals across batches") {
    import spark.implicits._
    val input = MemoryStream[EventStreams.UserEvent](spark)
    val running = EventStreams.runningUserTotals(input.toDS())
    val q = running.writeStream.format("memory").queryName("running")
      .outputMode("update").start()

    input.addData(EventStreams.UserEvent(1, 2.0), EventStreams.UserEvent(1, 3.0))
    q.processAllAvailable()
    input.addData(EventStreams.UserEvent(1, 5.0))
    q.processAllAvailable()
    q.stop()

    val last = spark.table("running").where(col("user_id") === 1)
      .orderBy(col("n").desc).head()
    assert(last.getAs[Long]("n") == 3L)
    assert(last.getAs[Double]("total") == 10.0)
  }

  test("flatMapGroupsWithState: event-time timeout closes and emits sessions exactly once") {
    import spark.implicits._
    import EventStreams.TimedEvent
    val input = MemoryStream[TimedEvent](spark)
    val sessions = EventStreams.sessionsWithTimeout(input.toDS(), gapMinutes = 10)
    val q = sessions.writeStream.format("memory").queryName("touts")
      .outputMode("append").start()

    // user 1: two events 5 min apart -> one open session
    input.addData(TimedEvent(1L, ts(0), 2.0), TimedEvent(1L, ts(5), 3.0))
    q.processAllAvailable()
    assert(spark.table("touts").isEmpty) // nothing closed yet

    // user 2 at 10:30 advances the watermark past 10:05 + 10 min
    // -> user 1's state times out and the session is emitted
    input.addData(TimedEvent(2L, ts(30), 1.0))
    q.processAllAvailable()
    // one more trigger so the timeout fires after the watermark update
    input.addData(TimedEvent(2L, ts(31), 1.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("touts").where(col("user_id") === 1L).collect()
    assert(out.length == 1, s"expected exactly one closed session, got ${out.toSeq}")
    val s = out.head
    assert(s.getAs[Long]("start_ms") == ts(0).getTime)
    assert(s.getAs[Long]("end_ms") == ts(5).getTime)
    assert(s.getAs[Long]("n") == 2L && s.getAs[Double]("total") == 5.0)
  }

  test("flatMapGroupsWithState: an in-batch gap closes the earlier session immediately") {
    import spark.implicits._
    import EventStreams.TimedEvent
    val input = MemoryStream[TimedEvent](spark)
    val sessions = EventStreams.sessionsWithTimeout(input.toDS(), gapMinutes = 10)
    val q = sessions.writeStream.format("memory").queryName("gaps")
      .outputMode("append").start()

    // 10:00 and 10:25 exceed the 10-minute gap inside one batch
    input.addData(TimedEvent(7L, ts(0), 1.0), TimedEvent(7L, ts(25), 4.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("gaps").where(col("user_id") === 7L).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("start_ms") == ts(0).getTime)
    assert(out.head.getAs[Long]("end_ms") == ts(0).getTime)
    assert(out.head.getAs[Long]("n") == 1L)
  }
}
