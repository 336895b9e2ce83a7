package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming top-k: bounded per-key leaderboard state converging to the
  * batch window twin regardless of arrival order.
  */
@graft.SlowTest
class StreamingTopKSpec extends SparkSpec {

  private def finalTopK(table: String): Seq[(String, Int, Long, Double)] = {
    // update-mode upsert contract: per key, the rows with the max seq win
    val all = spark.table(table)
      .select("event_type", "seq", "rank", "event_id", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    all.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val latest = rows.map(_._2).max
      rows.filter(_._2 == latest)
    }.map(t => (t._1, t._3, t._4, t._5)).sortBy(t => (t._1, t._2))
  }

  test("streaming top-k converges to the batch twin across micro-batches") {
    import spark.implicits._
    val input = MemoryStream[ScoredEvent](spark)
    val q = TopK.topKPerType(input.toDS(), 3)
      .writeStream.format("memory").queryName("topk").outputMode("update").start()

    val batch1 = Seq(
      ScoredEvent("click", 1L, 5.0), ScoredEvent("click", 2L, 9.0),
      ScoredEvent("click", 3L, 1.0), ScoredEvent("view", 10L, 2.0))
    val batch2 = Seq(
      ScoredEvent("click", 4L, 7.0), ScoredEvent("click", 5L, 0.5),
      ScoredEvent("view", 11L, 8.0), ScoredEvent("view", 12L, 8.0))
    input.addData(batch1); q.processAllAvailable()
    input.addData(batch2); q.processAllAvailable()
    q.stop()

    val got = finalTopK("topk")
    val want = TopK.batchTopK((batch1 ++ batch2).toDS(), 3)
      .collect().map(t => (t.event_type, t.rank, t.event_id, t.value))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == want, s"got $got\nwant $want")
    // ties (11 vs 12 at 8.0) resolved by event_id: 11 ranks first
    assert(got.find(t => t._1 == "view" && t._2 == 1).get._3 == 11L)
  }

  test("unchanged state emits nothing; state stays bounded at k") {
    import spark.implicits._
    val input = MemoryStream[ScoredEvent](spark)
    val q = TopK.topKPerType(input.toDS(), 2)
      .writeStream.format("memory").queryName("topk2").outputMode("update").start()
    input.addData(Seq(ScoredEvent("a", 1L, 10.0), ScoredEvent("a", 2L, 9.0)))
    q.processAllAvailable()
    val after1 = spark.table("topk2").count()
    // strictly worse scores: leaderboard unchanged → no new emission
    input.addData(Seq(ScoredEvent("a", 3L, 1.0), ScoredEvent("a", 4L, 2.0)))
    q.processAllAvailable()
    val after2 = spark.table("topk2").count()
    q.stop()
    assert(after1 == 2L, s"expected one emission of k=2 rows, got $after1")
    assert(after2 == after1, "no-change batch should emit nothing")
  }

  test("arrival order does not matter (replay convergence)") {
    import spark.implicits._
    val evs = (1 to 50).map(i => ScoredEvent("t", i.toLong, (i * 37 % 23).toDouble))
    def runWith(order: Seq[ScoredEvent], name: String): Seq[(String, Int, Long, Double)] = {
      val input = MemoryStream[ScoredEvent](spark)
      val q = TopK.topKPerType(input.toDS(), 5)
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      order.grouped(7).foreach { g => input.addData(g); q.processAllAvailable() }
      q.stop()
      finalTopK(name)
    }
    val fwd = runWith(evs, "topk_fwd")
    val rev = runWith(evs.reverse, "topk_rev")
    assert(fwd == rev && fwd.size == 5)
  }
}
