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

  test("distributed path converges on a >20-diameter chain (pointer jumping)") {
    import spark.implicits._
    // 120-node chain: diameter 119. Plain min-label hooking needs 119
    // rounds to carry label 0 to the far end — the round-8 code capped at
    // 20 and silently returned a split component. Pointer jumping closes
    // it in O(log 119) ≈ 7 rounds; this test drives the DISTRIBUTED path
    // (smallGraphLimit = -1) and demands a single cluster labeled 0.
    val chain = (0L until 119L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponentsOf(chain, smallGraphLimit = -1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(out == (0L until 120L).map(i => (i, 0L)))
    // forest: the same chain plus a disjoint 25-node chain offset at 1000
    // — labels must not bleed across components.
    val forest = chain.union(
      (1000L until 1024L).map(i => (i, i + 1)).toDF("doc_a", "doc_b"))
    val out2 = Dedup.connectedComponentsOf(forest, smallGraphLimit = -1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(out2 ==
      (0L until 120L).map(i => (i, 0L)) ++ (1000L until 1025L).map(i => (i, 1000L)))
  }

  test("property: distributed path equals driver union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(991)
    (1 to 6).foreach { round =>
      // sparse random graphs over a sparse id space: multiple components,
      // repeated edges, self-contained islands
      val n = 30 + rnd.nextInt(60)
      val edges = (0 until n).map { _ =>
        (rnd.nextInt(40).toLong * 7L, rnd.nextInt(40).toLong * 7L + (if (rnd.nextBoolean()) 7L else 0L))
      }.filter { case (a, b) => a != b }
      val df = edges.toDF("doc_a", "doc_b")
      def labels(limit: Long) =
        Dedup.connectedComponentsOf(df, smallGraphLimit = limit)
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(labels(-1L) == labels(Long.MaxValue),
        s"round $round: distributed and union-find labels diverge on ${edges.take(8)}…")
    }
  }

  test("triangle census on crafted graphs: K4, open path, triangle + pendant") {
    import spark.implicits._
    def stats(edges: (Long, Long)*): (Long, Long, Option[Double]) = {
      val r = Dedup.triangleStatsOf(edges.toSeq.toDF("a", "b")).head()
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }
    // K4: C(4,3)=4 triangles; every vertex deg 3 → 4·3 wedges; coeff 1.0
    assert(stats((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)) ==
      ((4L, 12L, Some(1.0))))
    // open path 1-2-3: no triangle, one wedge, coefficient 0
    assert(stats((1L, 2L), (2L, 3L)) == ((0L, 1L, Some(0.0))))
    // triangle {1,2,3} with pendant 3-4: degs (2,2,3,1) → wedges 1+1+3 = 5
    assert(stats((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)) == ((1L, 5L, Some(3.0 / 5.0))))
    // matching (two disjoint edges): zero wedges → NULL coefficient
    assert(stats((1L, 2L), (3L, 4L)) == ((0L, 0L, None)))
  }
}
