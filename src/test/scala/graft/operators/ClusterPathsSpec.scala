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

  test("property: hook+compress converges in <= ceil(log2(diameter)) + 3 rounds") {
    import spark.implicits._
    // Deterministic worst cases: chains of known diameter. Pure hooking
    // needs `diameter` rounds; the compression step is what buys the log —
    // a refactor that breaks it fails HERE, in the fast gate, instead of
    // via the 64-round throw on a production graph.
    def bound(diameter: Int): Int =
      math.ceil(math.log(diameter.toDouble) / math.log(2.0)).toInt + 3
    for (len <- Seq(127, 1023, 4095)) {
      val chain = (0L until len.toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      val (out, rounds) = Dedup.connectedComponentsWithRounds(chain, smallGraphLimit = -1L)
      assert(out.where(org.apache.spark.sql.functions.col("cluster_id") =!= 0L).count() == 0L,
        s"chain $len: expected one component labeled 0")
      assert(rounds <= bound(len), s"chain $len (diameter $len): $rounds rounds > ${bound(len)}")
      info(s"chain diameter $len: $rounds rounds (bound ${bound(len)})")
    }
    // Random forest ~10^4 nodes: three random-attachment trees. True
    // diameter computed driver-side (double BFS per tree) so the bound is
    // exact, not estimated.
    val rnd = new scala.util.Random(7331)
    val trees = Seq(0L, 100000L, 200000L).map { off =>
      val n = 3000 + rnd.nextInt(500)
      (off, (1 until n).map(i => (off + rnd.nextInt(i), off + i)))
    }
    def diameterOf(edges: Seq[(Long, Long)]): Int = {
      val adj = scala.collection.mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
      edges.foreach { case (a, b) => adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
      def bfs(src: Long): (Long, Int) = {
        val dist = scala.collection.mutable.Map(src -> 0)
        var frontier = List(src); var far = (src, 0)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(u => adj(u).filter(!dist.contains(_)).map { v =>
            dist(v) = dist(u) + 1; if (dist(v) > far._2) far = (v, dist(v)); v
          })
        }
        far
      }
      bfs(bfs(edges.head._1)._1)._2
    }
    val diameter = trees.map(t => diameterOf(t._2)).max
    val all = trees.flatMap(_._2).toDF("doc_a", "doc_b")
    val (outF, roundsF) = Dedup.connectedComponentsWithRounds(all, smallGraphLimit = -1L)
    val labels = outF.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    trees.foreach { case (off, edges) =>
      val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
      assert(ids.forall(labels(_) == off), s"tree at $off not labeled by its min id")
    }
    assert(roundsF <= bound(diameter),
      s"forest (max diameter $diameter): $roundsF rounds > ${bound(diameter)}")
    info(s"forest ~10^4 nodes, max diameter $diameter: $roundsF rounds (bound ${bound(diameter)})")
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
