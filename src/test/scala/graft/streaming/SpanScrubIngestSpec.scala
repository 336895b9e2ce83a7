package graft.streaming

import graft.SparkSpec
import graft.operators.{Dedup, SpanIndex}
import org.apache.spark.sql.functions._

/** Span-coverage ingest gate: crafted batches through
  * [[SpanScrubIngest.appendScrubbed]], plus the memoized corpus landing
  * against the declared face's SQL recurrence semantics.
  */
@graft.SlowTest
class SpanScrubIngestSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "the quick brown fox jumps over the lazy dog again " * 6

  private def freshStores(tag: String) = {
    val dir = tmpDir(s"span-gate-$tag")
    val t = graft.core.VectorTable.create(spark, s"$dir/table")
    val idx = new java.util.concurrent.atomic.AtomicReference(
      SpanIndex.build(t, s"$dir/index"))
    (t, idx)
  }

  test("a later doc rebuilt from landed spans is dropped; novel and short docs land") {
    val (t, idx) = freshStores("basic")
    val b0 = Seq((0L, boiler + "zzz unique tail")).toDF("doc_id", "text")
    val (k0, d0) = SpanScrubIngest.appendScrubbed(t, idx, b0,
      Dedup.spanScrubMaxPermille, Some(0L))
    assert(k0 == 1 && d0 == 0, "first batch always lands (empty index)")
    val b1 = Seq(
      (10L, boiler + "yyy other tail"),                    // mostly landed spans
      (11L, "totally different novel content here " * 8),  // novel
      (12L, "tiny")                                        // < window: no evidence
    ).toDF("doc_id", "text")
    val (k1, d1) = SpanScrubIngest.appendScrubbed(t, idx, b1,
      Dedup.spanScrubMaxPermille, Some(1L))
    assert(k1 == 2 && d1 == 1, s"expected the boilerplate rebuild dropped: kept=$k1")
    val landed = t.scan().select("doc_id").collect().map(_.getLong(0)).toSet
    assert(landed == Set(0L, 11L, 12L))
  }

  test("replayed batch is a no-op; index only ever holds landed docs' spans") {
    val (t, idx) = freshStores("replay")
    val b0 = Seq((0L, boiler)).toDF("doc_id", "text")
    SpanScrubIngest.appendScrubbed(t, idx, b0, Dedup.spanScrubMaxPermille, Some(0L))
    val lenAfter = t.length
    val (k, d) = SpanScrubIngest.appendScrubbed(t, idx, b0,
      Dedup.spanScrubMaxPermille, Some(0L))
    assert(k == 0 && d == 0 && t.length == lenAfter)
    val idxDocs = idx.get().windows.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(idxDocs == Set(0L))
  }

  test("corpus landing replays the declared recurrence: batch 0 all lands, later batches gate") {
    val d = sf()
    val face = Dedup.spanIngestGate(spark, d).cache()
    val n0 = graft.core.Tables.documents(spark, d)
      .agg(max(col("doc_id"))).head.getLong(0) + 1
    val batch0Input = graft.core.Tables.documents(spark, d)
      .where(col("doc_id") < n0 / 4).count()
    assert(face.where(col("batch") === 0).count() == batch0Input,
      "batch 0 lands in full against the empty index")
    assert(face.select("doc_id").distinct().count() == face.count())
  }
}
