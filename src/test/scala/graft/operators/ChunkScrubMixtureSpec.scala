package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties of the round-14 chunking / span-scrub / temperature-mixture
  * faces, independent of the oracle's value-level replay:
  *   - chunking COVERS: every token of every doc lands in ≥1 window, the
  *     last window ends exactly at the doc's final token, and a doc of
  *     ≤ window tokens yields exactly one window holding all of them;
  *   - chunking OVERLAPS: consecutive full windows share window − stride
  *     tokens (the stride arithmetic, pinned on real data);
  *   - span scrub charges the COPY, never the canonical first occurrence
  *     (crafted fixture: an exact textual copy scores 1000‰ and is
  *     dropped, its min-doc_id original and an unrelated doc keep);
  *   - temperature mixture is a valid flattened allocation: integer
  *     shares sum to ≤ 1000 with bounded floor loss, the token allocation
  *     respects the epoch budget, and α = 1/2 ORDER-flattens — bigger
  *     sources get bigger absolute allocations but smaller boosts.
  */
class ChunkScrubMixtureSpec extends SparkSpec {
  import spark.implicits._

  private val W = TextOps.chunkWindowTokens
  private val S = TextOps.chunkStrideTokens

  private lazy val chunks = TextOps.chunkWindows(spark, sf()).cache()
  private lazy val docTok = graft.core.Tables.documents(spark, sf())
    .select(col("doc_id"), size(TextOps.tokens("text")).as("n_tokens")).cache()

  test("chunk windows cover every doc exactly to its last token") {
    val cover = chunks
      .groupBy("doc_id")
      .agg(max(col("win_id") * S + col("win_tokens")).as("covered"),
        count(lit(1)).as("n_windows"), min("win_id").as("first_win"))
      .join(docTok, Seq("doc_id"))
    assert(cover.where(col("covered") =!= col("n_tokens")).count() == 0,
      "last window must end at the doc's final token")
    assert(cover.where(col("first_win") =!= 0).count() == 0)
    assert(cover.count() == docTok.count(), "every doc chunks")
    val expected = cover.where(col("n_windows") =!=
      greatest(lit(0L), ceil((col("n_tokens") - W).cast("double") / S).cast("long")) + 1L)
    assert(expected.count() == 0, "window count = 1 + ceil(max(0, n-W)/S)")
  }

  test("short docs yield one window holding the whole doc") {
    val short = chunks.join(docTok.where(col("n_tokens") <= W), Seq("doc_id"))
    assert(short.where(col("win_id") =!= 0 || col("win_tokens") =!= col("n_tokens"))
      .count() == 0)
  }

  test("consecutive full windows overlap by window - stride tokens") {
    // token index ranges: win i covers [i*S+1, i*S+win_tokens]; for two
    // consecutive FULL windows the intersection is W - S tokens.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("win_id")
    val pairs = chunks
      .withColumn("next_chunk", lead(col("chunk"), 1).over(w))
      .withColumn("next_tokens", lead(col("win_tokens"), 1).over(w))
      .where(col("win_tokens") === W && col("next_tokens") === W)
    val overlap = pairs.where(
      expr(s"array_join(slice(split(chunk, ' '), ${S + 1}, ${W - S}), ' ')") =!=
        expr(s"array_join(slice(split(next_chunk, ' '), 1, ${W - S}), ' ')"))
    assert(overlap.count() == 0,
      "tail of window i must equal head of window i+1 token-for-token")
    assert(pairs.count() > 0, "the fixture corpus must exercise full-window overlap")
  }

  test("span scrub drops the copy and keeps the canonical original") {
    val span = "the quick brown fox jumps over the lazy dog again and again " * 4
    val docs = Seq(
      (0L, span + " unique tail zero"),
      (1L, span + " unique tail zero"), // exact copy of doc 0's span mass
      (2L, "completely unrelated content " * 12)
    ).toDF("doc_id", "text")
    val v = Dedup.spanScrubOf(docs).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(v(0L)._4, "canonical first occurrence keeps")
    assert(v(0L)._2 == 0L, "first occurrence is never charged")
    assert(!v(1L)._4, "the exact copy is dropped")
    assert(v(1L)._3 >= Dedup.spanScrubMaxPermille)
    assert(v(2L)._4 && v(2L)._2 == 0L, "unrelated doc untouched")
  }

  test("span scrub verdicts cover every doc once with sane counts") {
    val v = Dedup.spanScrub(spark, sf()).cache()
    assert(v.count() == docTok.count())
    assert(v.select("doc_id").distinct().count() == v.count())
    assert(v.where(col("n_dup_windows") > col("n_windows")).count() == 0)
    assert(v.where(col("dup_permille") < 0 || col("dup_permille") > 1000).count() == 0)
  }

  test("temperature mixture allocates a valid flattened epoch") {
    val m = TextOps.temperatureMixture(spark, sf()).cache()
    val n = m.count()
    assert(n >= 2, "fixture corpus has multiple sources")
    val shareSum = m.agg(sum("share_permille")).as[Long].head()
    assert(shareSum <= 1000 && shareSum > 1000 - n, s"floor loss bounded: $shareSum")
    val tokSum = m.agg(sum("epoch_tokens")).as[Long].head()
    assert(tokSum <= TextOps.temperatureEpochTokens)
    // α = 1/2 flattening: weight monotone in mass, boost anti-monotone
    val rows = m.orderBy("token_mass").collect()
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("weight") <= hi.getAs[Long]("weight"))
      assert(lo.getAs[Long]("boost_x1000") >= hi.getAs[Long]("boost_x1000"),
        "flattening must boost scarce sources at least as much as bulk ones")
    }
  }
}
