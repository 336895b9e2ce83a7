package graft.operators

import graft.SparkSpec

/** The containment join's asymmetric prefix filter must be LOSSLESS: the
  * operator's contract is ALL pairs with |A∩B|/min ≥ τ, not "containment
  * over someone else's candidate set" — the motivating pairs (short doc
  * quoted inside a long one) have low Jaccard and would rarely survive
  * Jaccard-tuned LSH banding.
  */
class ContainmentJoinSpec extends SparkSpec {

  private def brute(corpus: Seq[(Long, Array[Long])]): Map[(Long, Long), (Long, Long)] =
    (for {
      (a, sa) <- corpus; (b, sb) <- corpus if a < b && sa.nonEmpty && sb.nonEmpty
      inter = sa.intersect(sb).length.toLong
      nMin = math.min(sa.length, sb.length).toLong
      if inter * Dedup.containTauDen >= nMin * Dedup.containTauNum
    } yield ((a, b), (inter, nMin))).toMap

  test("containment join equals brute force over the full gate corpus") {
    val docs = graft.core.Tables.documents(spark, sf())
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.TextFunctions.shingleHashes(
          org.apache.spark.sql.functions.col("text")).as("sh"))
      .where(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("sh")) > 0)
    val corpus = docs.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val want = brute(corpus.toIndexedSeq)
    val got = Dedup.containmentPairs(spark, sf())
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got == want,
      s"engine=${got.size} pairs, brute=${want.size}; " +
        s"missing=${(want.keySet -- got.keySet).take(5)}, extra=${(got.keySet -- want.keySet).take(5)}")
    assert(want.nonEmpty, "expected qualifying containment pairs at sf0.001")
  }

  test("the motivating asymmetric case is found: short doc inside a long one, tiny Jaccard") {
    import spark.implicits._
    // shingle-set surrogate frame: doc 1 = 8 elements, doc 2 = those 8
    // plus 92 others -> containment 1.0, Jaccard 0.08
    val short = (1L to 8L).toArray
    val long_ = (1L to 100L).toArray
    val noise = (200L to 260L).toArray
    val corpus = Seq((1L, short), (2L, long_), (3L, noise))
    val got = Dedup.containmentJoinOf(corpus.toDF("doc_id", "sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    assert(got == Set((1L, 2L, 1.0)), s"expected exactly the contained pair, got $got")
  }

  test("property: prefix + positional filters are lossless on skew-sized random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(10101)
    (1 to 5).foreach { round =>
      // heavy size skew: some tiny docs, some huge, small universe for
      // overlap — the regime where a broken asymmetric bound drops pairs
      val universe = 30 + rnd.nextInt(80)
      val corpus = (0L until (20 + rnd.nextInt(30)).toLong).map { id =>
        val n = if (rnd.nextBoolean()) 1 + rnd.nextInt(4) else 10 + rnd.nextInt(25)
        (id, rnd.shuffle((1L to universe.toLong).toList)
          .take(math.min(n, universe)).sorted.toArray)
      }
      val want = brute(corpus)
      val got = Dedup.containmentJoinOf(corpus.toDF("doc_id", "sh"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
      assert(got == want,
        s"round $round (universe=$universe): engine=${got.size}, brute=${want.size}; " +
          s"missing=${(want.keySet -- got.keySet).take(5)}, extra=${(got.keySet -- want.keySet).take(5)}")
    }
  }
}
