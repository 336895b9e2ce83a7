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
