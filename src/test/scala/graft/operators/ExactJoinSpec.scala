package graft.operators

import graft.SparkSpec

/** The exact prefix-filtered join and the MinHash/LSH pipeline share the
  * same similarity measure (hashed word-3-gram shingle sets, τ = 1/2), so
  * containment is a theorem: LSH can only MISS pairs, never add them.
  * This spec measures the approximate path's recall against the exact one
  * — the measurement a pipeline owner runs before trusting LSH at scale.
  */
class ExactJoinSpec extends SparkSpec {

  test("LSH-verified pairs are a subset of the exact join; recall is reported") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.exactJaccardJoin(spark, sf()))
    val lsh = pairs(Dedup.jaccardVerifiedPairs(spark, sf()))
    assert(exact.nonEmpty, "expected qualifying pairs at sf0.001")
    val leaked = lsh -- exact
    assert(leaked.isEmpty, s"LSH 'verified' pairs missing from the exact join: $leaked")
    val recall = lsh.size.toDouble / exact.size.toDouble
    info(f"LSH recall vs exact join: ${lsh.size}/${exact.size} = $recall%.3f")
    assert(recall > 0.5, s"LSH recall unexpectedly low: $recall")
  }
}
