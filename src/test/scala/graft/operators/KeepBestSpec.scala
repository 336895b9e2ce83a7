package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quality-aware keeper selection ([[Similarity.semanticKeepBest]]) and the
  * cross-modal paraphrase face ([[Similarity.paraphraseCandidates]]):
  * keep-best must preserve the verdict pipeline's cluster structure while
  * re-picking each keeper by (quality desc, id); paraphrase candidates must
  * be exactly the semantic near-dups with no lexical LSH signal.
  */
class KeepBestSpec extends SparkSpec {

  test("exactly one keeper per cluster, and it maximizes (quality, -id)") {
    val rows = Similarity.semanticKeepBest(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (cid, ms) =>
      val keepers = ms.filter(_._4)
      assert(keepers.length == 1, s"cluster $cid has ${keepers.length} keepers")
      val best = ms.minBy { case (id, _, q, _) => (-q, id) }
      assert(keepers.head._1 == best._1,
        s"cluster $cid keeper ${keepers.head._1} is not the quality argmax ${best._1}")
    }
  }

  test("cluster structure is the verdict pipeline's, only the keeper policy differs") {
    val base = Similarity.semanticDedup(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val best = Similarity.semanticKeepBest(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(best == base, "keep-best changed the cluster partition")
  }

  test("paraphrase candidates = semantic near-dups minus lexical LSH candidates") {
    val near = Similarity.embeddingNearDups(spark, sf())
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.lshCandidatePairs(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val para = Similarity.paraphraseCandidates(spark, sf())
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(para == near.diff(lsh),
      s"paraphrase set diverges: extra=${(para -- near.diff(lsh)).take(3)} " +
        s"missing=${(near.diff(lsh) -- para).take(3)}")
  }
}
