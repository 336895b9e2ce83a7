package graft.streaming

import graft.SparkSpec

/** The ingest gate's distributed greedy sweep
  * ([[SemanticDedupIngest.distributedGreedyDropped]]) must compute the
  * SAME lexicographically-first MIS as the driver-side sequential sweep —
  * the scale path beyond `smallEdgeLimit` is only legitimate if it is
  * semantics-preserving on crafted graphs, including ones that force
  * multiple elimination rounds (a path graph's dependency chain).
  */
class SemanticSweepSpec extends SparkSpec {

  /** Sequential reference: v is dropped iff it has a KEPT neighbor u < v. */
  private def greedyDropped(edges: Seq[(Long, Long)]): Set[Long] = {
    val neighbors = edges.foldLeft(Map.empty[Long, List[Long]].withDefaultValue(Nil)) {
      case (m, (a, b)) => m.updated(a, b :: m(a)).updated(b, a :: m(b))
    }
    val kept = scala.collection.mutable.Set.empty[Long]
    val dropped = scala.collection.mutable.Set.empty[Long]
    neighbors.keys.toSeq.sorted.foreach { v =>
      if (neighbors(v).exists(u => u < v && kept(u))) dropped += v else kept += v
    }
    dropped.toSet
  }

  private def distributed(edges: Seq[(Long, Long)]): Set[Long] = {
    import spark.implicits._
    SemanticDedupIngest.distributedGreedyDropped(edges.toDF("doc_a", "doc_b"))
      .collect().map(_.getLong(0)).toSet
  }

  test("path graph: alternating keep/drop needs multiple elimination rounds") {
    val edges = (1L until 8L).map(i => (i, i + 1))
    assert(greedyDropped(edges) == Set(2L, 4L, 6L, 8L))
    assert(distributed(edges) == Set(2L, 4L, 6L, 8L))
  }

  test("star out of the min node drops every leaf") {
    val edges = (2L to 10L).map(i => (1L, i))
    assert(distributed(edges) == (2L to 10L).toSet)
  }

  test("star into the max node keeps every leaf") {
    val edges = (1L to 9L).map(i => (i, 100L))
    assert(distributed(edges) == Set(100L))
  }

  test("edge orientation is read by NAME, not column position") {
    import spark.implicits._
    // physical order (doc_b, doc_a) — the shape an upstream join (which
    // moves key columns first) hands over; a positional read would invert
    // the graph and keep the MAX of a clique instead of the min
    val scrambled = (for {a <- 1L to 4L; b <- (a + 1) to 4L} yield (b, a))
      .toDF("doc_b", "doc_a")
    val dropped = SemanticDedupIngest.distributedGreedyDropped(scrambled)
      .collect().map(_.getLong(0)).toSet
    assert(dropped == Set(2L, 3L, 4L))
  }

  test("random graphs: distributed ≡ sequential greedy") {
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { trial =>
      val edges = Seq.fill(300) {
        val a = rnd.nextInt(100).toLong
        val b = rnd.nextInt(100).toLong
        (math.min(a, b), math.max(a, b))
      }.filter { case (a, b) => a != b }.distinct
      assert(distributed(edges) == greedyDropped(edges), s"trial $trial")
    }
  }
}
