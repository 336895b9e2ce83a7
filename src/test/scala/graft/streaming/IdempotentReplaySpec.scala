package graft.streaming

import graft.SparkSpec
import graft.core.{Manifest, VectorTable}

case class IRec(id: Long, payload: String)

/** Replay idempotence of the streaming write path: foreachBatch is
  * at-least-once (a crash after `append` but before the checkpoint commit
  * replays the micro-batch), so `VectorTable.append(streamBatchId=...)`
  * records the highest applied stream batch id in the manifest and replays
  * become no-ops — no duplicate rows, no rowid gaps.
  */
@graft.SlowTest
class IdempotentReplaySpec extends SparkSpec {
  import spark.implicits._

  test("append with an already-applied streamBatchId is a no-op") {
    val table = VectorTable.create(spark, tmpDir("replay"))
    val b0 = Seq(IRec(0, "a"), IRec(1, "b")).toDF()
    val b1 = Seq(IRec(2, "c")).toDF()

    table.append(b0, streamBatchId = Some(0L))
    table.append(b1, streamBatchId = Some(1L))
    assert(table.length == 3L)

    // crash-replay of batch 1: same id → skipped, length unchanged
    table.append(b1, streamBatchId = Some(1L))
    assert(table.length == 3L)
    // stale replay of batch 0 likewise
    table.append(b0, streamBatchId = Some(0L))
    assert(table.length == 3L)
    // the next genuine batch still lands
    table.append(Seq(IRec(3, "d")).toDF(), streamBatchId = Some(2L))
    assert(table.length == 4L)
    assert(table.scan().select("_rowid").as[Long].collect().sorted.toSeq == (0L until 4L))
  }

  test("streamBatch high-water mark survives manifest round-trip and compaction") {
    val root = tmpDir("replay-manifest")
    val table = VectorTable.create(spark, root)
    table.append(Seq(IRec(0, "a")).toDF(), streamBatchId = Some(7L))
    table.append(Seq(IRec(1, "b")).toDF()) // non-streaming append keeps the mark
    assert(Manifest.load(root).streamBatch == 7L)
    assert(Manifest.parse(Manifest.load(root).serialize).streamBatch == 7L)
    table.compact()
    assert(Manifest.load(root).streamBatch == 7L)
    // old manifests (no streamBatch line) parse with the -1 sentinel
    assert(Manifest.parse("version=1\nlength=0\nlayout=dynamic\n").streamBatch == -1L)
  }

  test("deduped ingest skips replayed micro-batches before any work") {
    val table = VectorTable.create(spark, tmpDir("replay-dedup"))
    val batch = Seq(IRec(0, "x"), IRec(1, "y")).toDF()
    val (novel, _) = DedupIngest.appendDeduped(table, batch, Seq("id", "payload"),
      streamBatchId = Some(0L))
    assert(novel == 2L && table.length == 2L)
    val (replayNovel, replayDropped) = DedupIngest.appendDeduped(table, batch,
      Seq("id", "payload"), streamBatchId = Some(0L))
    assert(replayNovel == 0L && replayDropped == 0L && table.length == 2L)
  }
}
