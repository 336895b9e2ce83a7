package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The semantic dedup-at-ingest gate ([[SemanticDedupIngest]] through
  * [[Similarity.semanticIngestRoot]]): the stream-landed id set must equal
  * the sequential greedy sweep over the whole corpus in vec_id order —
  * keep v iff no kept neighbor u < v in the within-cell cosine graph —
  * and the declared face's two uniqueness invariants must both measure
  * TRUE. Greedy-MIS ≠ min-per-component: a chain a–b–c at threshold keeps
  * {a, c} here where the component face keeps {a} — the test corpus
  * exercises both kinds of structure.
  */
@graft.SlowTest
class SemanticIngestSpec extends SparkSpec {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("clique batch: gate ≡ sequential greedy, driver sweep sees only distinct vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def unit(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      val v = Array.fill(8)(r.nextFloat() * 2f - 1f)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val centroids = Array(unit(1), unit(2), unit(3), unit(4))
    def cellOf(v: Array[Float]): Int = {
      val sims = centroids.map(c => cos(v, c))
      sims.indexOf(sims.max)
    }
    val dir = tmpDir("sem-ingest-clique")
    val t = graft.core.VectorTable.create(spark, s"$dir/table")
    val idx = new java.util.concurrent.atomic.AtomicReference(
      graft.operators.IvfTableIndex.buildWith(t, s"$dir/index", centroids))

    val base = (0L until 20L).map(i => (i, unit(100 + i.toInt)))
    val (k1, _) = SemanticDedupIngest.appendDeduped(t, idx,
      base.toDF("vec_id", "embedding"), Similarity.nearDupThreshold, Some(0L))
    assert(k1 > 0)

    // batch 2: a 500-copy clique + fresh vectors + identical ZERO vectors
    val clique = unit(42)
    val b2 = (1000L until 1500L).map(i => (i, clique)) ++
      (2000L until 2010L).map(i => (i, unit(300 + i.toInt))) ++
      (3000L until 3003L).map(i => (i, Array.fill(8)(0f)))
    SemanticDedupIngest.appendDeduped(t, idx,
      b2.toDF("vec_id", "embedding"), Similarity.nearDupThreshold, Some(1L))

    // sequential greedy reference over the FULL arrival order
    val all = (base ++ b2).sortBy(_._1)
    val kept = scala.collection.mutable.Set.empty[Long]
    all.foreach { case (v, e) =>
      val blocked = all.exists { case (u, f) =>
        u < v && kept(u) && cellOf(e) == cellOf(f) && {
          val s = cos(e, f); !s.isNaN && s >= Similarity.nearDupThreshold
        }
      }
      if (!blocked) kept += v
    }
    val landed = t.scan().select("vec_id").collect().map(_.getLong(0)).toSet
    // identical copies can never coexist: the clique keeps at most one
    // (zero when a committed neighbor covers the shared vector — which is
    // what this fixture's reference computes)
    assert(kept.count(id => id >= 1000L && id < 1500L) <= 1, "clique kept two identical copies")
    assert((3000L until 3003L).forall(kept), "zero vectors must all be kept")
    assert(landed == kept.toSet,
      s"gate diverges from greedy: extra=${(landed -- kept).take(5)} " +
        s"missing=${(kept.toSet -- landed).take(5)}")
  }

  test("stream-landed set ≡ sequential greedy sweep in id order; invariants measure TRUE") {
    val d = sf()
    val emb = graft.core.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cellOf = Similarity.ivfAssign(spark, d)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ids = emb.keys.toSeq.sorted
    val kept = scala.collection.mutable.Set.empty[Long]
    ids.foreach { v =>
      val blocked = kept.exists(u => u < v && cellOf(u) == cellOf(v) && {
        val s = cos(emb(u), emb(v)); !s.isNaN && s >= Similarity.nearDupThreshold
      })
      if (!blocked) kept += v
    }
    assert(kept.size < ids.size, "fixture has no semantic dups — gate untested")

    val root = Similarity.semanticIngestRoot(spark, d)
    val landed = graft.core.VectorTable.open(spark, s"$root/table")
      .scan().select("vec_id").collect().map(_.getLong(0)).toSet
    assert(landed == kept.toSet,
      s"landed set diverges from the greedy sweep: extra=${(landed -- kept).take(5)} " +
        s"missing=${(kept.toSet -- landed).take(5)}")

    val r = Similarity.semanticIngestGate(spark, d).head()
    assert(r.getLong(0) == ids.size && r.getBoolean(1) && r.getBoolean(2),
      s"uniqueness invariants failed: $r")
  }
}
