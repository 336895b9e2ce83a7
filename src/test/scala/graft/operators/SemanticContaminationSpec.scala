package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic decontamination ([[Similarity.semanticContamination]]): the
  * map-only fused-kernel pass must equal a brute-force reference, and the
  * NaN discipline must hold — a zero-norm EVAL vector (whose cosine is
  * NaN against everything, which Spark orders ABOVE all numbers) must not
  * declare the whole corpus contaminated.
  */
class SemanticContaminationSpec extends SparkSpec {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("fused-kernel pass ≡ brute-force reference (ids, nearest eval, hit set)") {
    val d = sf()
    val all = graft.core.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val eval = all.filter(_._1 % 50 == 0).sortBy(_._1)
    val corpus = all.filter(_._1 % 50 != 0)
    val want = corpus.flatMap { case (id, v) =>
      val sims = eval.map { case (eid, e) => (eid, cos(v, e)) }
        .filter(!_._2.isNaN)
      if (sims.isEmpty) None
      else {
        val mx = sims.map(_._2).max
        if (mx >= Similarity.nearDupThreshold)
          Some(id -> sims.filter(_._2 == mx).map(_._1).min)
        else None
      }
    }.toMap
    val got = Similarity.semanticContamination(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want,
      s"contamination diverges: extra=${(got.keySet -- want.keySet).take(3)} " +
        s"missing=${(want.keySet -- got.keySet).take(3)}")
    assert(want.nonEmpty, "fixture has no semantic contamination — face untested")
  }

  test("the batch face is MAP-ONLY: no exchange anywhere in the physical plan") {
    val plan = Similarity.semanticContamination(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"decontamination must be one codegen'd pass — plan shuffles:\n$plan")
  }

  test("a zero-norm eval vector never poisons the max (NaN is not evidence)") {
    import spark.implicits._
    val corpus = Seq(
      (10L, Array(1f, 0f)),   // sim 1.0 to eval 0 -> contaminated
      (11L, Array(0f, 1f)),   // sim 0.0 to eval 0 -> clean
      (12L, Array(0f, 0f)))   // zero-norm corpus row -> no defined sims
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticContaminationOf(corpus,
        Array(0L, 1L), Array(Array(1f, 0f), Array(0f, 0f))) // eval 1 is zero-norm
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((10L, 0L)),
      s"zero-norm eval/corpus handling broke: ${got.toSeq}")
  }
}
