package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The occupancy-capped hybrid pair expansion (in-row below
  * [[Dedup.bucketExpandCap]], per-pair-row join above — the round-10
  * SimHash discipline applied to the MinHash band and PPJoin prefix
  * paths) must be a pure EXECUTION-STRATEGY choice: forcing every bucket
  * through either branch yields the identical pair set, pair for pair.
  * A dup-heavy corpus (many copies of one document — the boilerplate-page
  * pathology that saturates one band bucket) is generated explicitly so
  * the hot branch is exercised for real, not vacuously green.
  */
class HotBucketSpec extends SparkSpec {

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MinHash band pairs: all-cold ≡ all-hot ≡ default cap on the gate corpus") {
    val bands = Dedup.bandsOf(Dedup.minhashSignatures(spark, sf())).localCheckpoint()
    val allCold = pairSet(Dedup.pairsFromBands(bands, Int.MaxValue))
    val allHot = pairSet(Dedup.pairsFromBands(bands, 1))
    val default = pairSet(Dedup.pairsFromBands(bands))
    assert(allCold.nonEmpty, "expected candidate pairs at sf0.001")
    assert(allHot == allCold, s"join-form pairs diverge: ${(allHot diff allCold).take(5)} / ${(allCold diff allHot).take(5)}")
    assert(default == allCold)
  }

  test("PPJoin prefix candidates: all-cold ≡ all-hot ≡ default cap, filters on and off") {
    val docs = graft.core.Tables.documents(spark, sf())
      .select(col("doc_id"), graft.functions.TextFunctions.shingleHashes(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
      .localCheckpoint()
    for (pp <- Seq(false, true)) {
      val allCold = pairSet(Dedup.exactJaccardCandidatesOf(docs, ppFilters = pp, cap = Int.MaxValue))
      val allHot = pairSet(Dedup.exactJaccardCandidatesOf(docs, ppFilters = pp, cap = 1))
      val default = pairSet(Dedup.exactJaccardCandidatesOf(docs, ppFilters = pp))
      assert(allCold.nonEmpty)
      assert(allHot == allCold, s"ppFilters=$pp: hot-path candidates diverge")
      assert(default == allCold)
    }
  }

  test("dup-heavy corpus: hot branch fires and the pair set still matches the all-cold form") {
    import spark.implicits._
    // 40 copies of one doc (one band bucket of occupancy ≥ 40, over any
    // test cap) + distinct fillers; cap=8 forces the copies through the
    // join branch while fillers stay in-row — both branches live at once.
    val copyText = "the quick brown fox jumps over the lazy dog again and again"
    val docs = ((0L until 40L).map(i => (i, copyText)) ++
      (100L until 140L).map(i => (i, s"unique document number $i with its own trailing words ${i * 7}")))
      .toDF("doc_id", "text")
    val bands = Dedup.bandsOf(Dedup.signaturesOf(docs)).localCheckpoint()
    val hybrid = pairSet(Dedup.pairsFromBands(bands, 8))
    val allCold = pairSet(Dedup.pairsFromBands(bands, Int.MaxValue))
    // the 40 copies alone contribute 40·39/2 = 780 pairs
    assert(allCold.size >= 780, s"expected the copy clique, got ${allCold.size} pairs")
    assert(hybrid == allCold)

    val shingled = docs
      .select(col("doc_id"), graft.functions.TextFunctions.shingleHashes(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
    val hybridPP = pairSet(Dedup.exactJaccardCandidatesOf(shingled, ppFilters = true, cap = 8))
    val coldPP = pairSet(Dedup.exactJaccardCandidatesOf(shingled, ppFilters = true, cap = Int.MaxValue))
    assert(coldPP.size >= 780)
    assert(hybridPP == coldPP)
  }
}
