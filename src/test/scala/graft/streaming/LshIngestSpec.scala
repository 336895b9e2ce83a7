package graft.streaming

import graft.SparkSpec
import graft.operators.{Dedup, LshIndex}
import org.apache.spark.sql.functions._

/** Lexical (MinHash-LSH + Jaccard-verified) ingest gate: crafted batches
  * through [[LshDedupIngest.appendGated]], plus the memoized corpus landing
  * against the declared face's SQL recurrence semantics. The gate is
  * committed-only (batch docs never charge each other), so in-batch
  * near-dups land together and gate every later batch — pinned below.
  */
@graft.SlowTest
class LshIngestSpec extends SparkSpec {
  import spark.implicits._

  // ~50 tokens; editing a couple of words keeps Jaccard over the distinct
  // shingle sets well above the 1/2 gate
  private val base = ("alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima mike november oscar papa quebec romeo sierra " +
    "tango uniform victor whiskey xray yankee zulu one two three four " +
    "five six seven eight nine ten eleven twelve thirteen fourteen").trim
  private def nearDup(tag: String) = base.replace("alpha", s"alpha$tag")
  private def novel(tag: String) =
    s"wholly different subject matter $tag " * 10

  private def freshStores(tag: String) = {
    val dir = tmpDir(s"lsh-gate-$tag")
    val t = graft.core.VectorTable.create(spark, s"$dir/table")
    val idx = new java.util.concurrent.atomic.AtomicReference(
      LshIndex.build(t, s"$dir/index"))
    (t, idx)
  }

  test("a later near-dup of a landed doc is dropped; novel docs land") {
    val (t, idx) = freshStores("basic")
    val b0 = Seq((0L, base)).toDF("doc_id", "text")
    val (k0, d0) = LshDedupIngest.appendGated(t, idx, b0, Some(0L))
    assert(k0 == 1 && d0 == 0, "first batch always lands (empty index)")
    val b1 = Seq(
      (10L, nearDup("x")),  // two-word edit of the landed doc
      (11L, novel("n"))
    ).toDF("doc_id", "text")
    val (k1, d1) = LshDedupIngest.appendGated(t, idx, b1, Some(1L))
    assert(k1 == 1 && d1 == 1, s"expected the near-dup dropped: kept=$k1")
    val landed = t.scan().select("doc_id").collect().map(_.getLong(0)).toSet
    assert(landed == Set(0L, 11L))
  }

  test("in-batch near-dups land together (committed-only gating), then gate later batches") {
    val (t, idx) = freshStores("inbatch")
    val b0 = Seq((0L, nearDup("a")), (1L, nearDup("b"))).toDF("doc_id", "text")
    val (k0, _) = LshDedupIngest.appendGated(t, idx, b0, Some(0L))
    assert(k0 == 2, "batch docs never charge each other")
    val b1 = Seq((10L, nearDup("c"))).toDF("doc_id", "text")
    val (k1, d1) = LshDedupIngest.appendGated(t, idx, b1, Some(1L))
    assert(k1 == 0 && d1 == 1, "the landed near-dups gate the next batch")
  }

  test("replayed batch is a no-op; index only ever holds landed docs' bands") {
    val (t, idx) = freshStores("replay")
    val b0 = Seq((0L, base)).toDF("doc_id", "text")
    LshDedupIngest.appendGated(t, idx, b0, Some(0L))
    val b1 = Seq((10L, nearDup("r")), (11L, novel("r"))).toDF("doc_id", "text")
    LshDedupIngest.appendGated(t, idx, b1, Some(1L))
    val lenAfter = t.length
    val (k, d) = LshDedupIngest.appendGated(t, idx, b1, Some(1L))
    assert(k == 0 && d == 0 && t.length == lenAfter)
    val idxDocs = idx.get().bands.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(idxDocs == Set(0L, 11L), "dropped docs never enter the index")
  }

  test("out-of-order arrival throws instead of silently breaking the recurrence") {
    val (t, idx) = freshStores("order")
    LshDedupIngest.appendGated(t, idx,
      Seq((10L, base)).toDF("doc_id", "text"), Some(0L))
    val e = intercept[IllegalArgumentException] {
      LshDedupIngest.appendGated(t, idx,
        Seq((5L, novel("o"))).toDF("doc_id", "text"), Some(1L))
    }
    assert(e.getMessage.contains("id-ordered arrival"))
  }

  test("corpus landing replays the declared recurrence: batch 0 all lands, later batches gate") {
    val d = sf()
    val face = Dedup.lshIngestGate(spark, d).cache()
    val n0 = graft.core.Tables.documents(spark, d)
      .agg(max(col("doc_id"))).head.getLong(0) + 1
    val batch0Input = graft.core.Tables.documents(spark, d)
      .where(col("doc_id") < n0 / 4).count()
    assert(face.where(col("batch") === 0).count() == batch0Input,
      "batch 0 lands in full against the empty index")
    assert(face.select("doc_id").distinct().count() == face.count())
    // every dropped doc has a verified landed near-dup with a smaller id —
    // the recurrence invariant, measured over the full landing
    val docs = graft.core.Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val droppedIds = docs.select("doc_id")
      .join(face.select("doc_id"), Seq("doc_id"), "left_anti")
    val verified = Dedup.jaccardVerifiedPairs(spark, d)
      .select(col("doc_a"), col("doc_b"))
    val coveredDropped = verified
      .join(face.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
      .join(droppedIds.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
      .select(col("doc_b").as("doc_id")).distinct()
    assert(droppedIds.join(coveredDropped, Seq("doc_id"), "left_anti").count() == 0,
      "every dropped doc must be covered by a smaller-id landed near-dup")
  }
}
