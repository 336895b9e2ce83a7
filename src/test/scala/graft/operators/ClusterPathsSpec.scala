package graft.operators

import graft.SparkSpec

/** The two connected-components strategies — driver union-find (≤1M edges)
  * and distributed min-label propagation (the scale path) — must produce
  * identical (id, cluster_id) assignments: cluster_id is the component's
  * minimum doc id under both.
  */
class ClusterPathsSpec extends SparkSpec {

  test("driver union-find and distributed propagation agree exactly") {
    val fast = Dedup.duplicateClusters(spark, sf(), smallGraphLimit = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val dist = Dedup.duplicateClusters(spark, sf(), smallGraphLimit = -1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(fast.nonEmpty, "expected a non-empty candidate graph at sf0.001")
    assert(fast == dist)
  }
}
