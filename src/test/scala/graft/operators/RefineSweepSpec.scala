package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The IVF+PQ refine stage and the nprobe tuning sweep.
  *
  * Refine dominance is a THEOREM, not a fixture property: the ADC top-k is
  * a prefix of the ADC-ordered shortlist (k < R), and any global-top-k
  * member x inside the shortlist has at most k−1 shortlist members with
  * higher exact sim, so the exact re-rank always keeps x. Hence
  * hits(refined) ≥ hits(adc) on every corpus — the spec pins the theorem
  * and the measured gate-corpus gap.
  */
class RefineSweepSpec extends SparkSpec {

  test("refined top-k serves exact cosine sims in exact order, k rows") {
    val d = sf()
    val emb = Tables.embeddings(spark, d)
    val q = emb.where(col("vec_id") === Similarity.pqQueryId)
      .select("embedding").head().getSeq[Float](0).toArray
    val byVec = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val served = Similarity.ivfPqRefinedSearch(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // the served sim column is the EXACT cosine (the whole point of the
    // refine stage — no ADC distortion in what callers rank on)
    served.foreach { case (id, sim) =>
      val expected = Similarity.driverCosine(byVec(id), q)
      assert(math.abs(expected - sim) < 1e-12, s"vec $id sim drift")
    }
    val resorted = served.sortBy { case (id, sim) => (-sim, id) }.toSeq
    assert(served.toSeq == resorted)
    assert(served.length == Similarity.pqTopK)
    assert(!served.map(_._1).contains(Similarity.pqQueryId))
  }

  test("refine dominance: hits(refined) >= hits(adc), and both measured") {
    val rows = Similarity.refineRecall(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows.keySet == Set("ivfpq_adc", "ivfpq_refined"))
    assert(rows("ivfpq_refined") >= rows("ivfpq_adc"))
  }

  test("probe sweep: candidates and hits monotone, full probe is exact") {
    val rows = Similarity.ivfProbeTuning(spark, sf())
      .orderBy("probes")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Similarity.probeSweep)
    val cands = rows.map(_._2)
    val hits = rows.map(_._3)
    assert(cands.zip(cands.tail).forall { case (a, b) => a <= b },
      s"candidate volume must grow with probes: ${cands.toSeq}")
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      s"hits must grow with probes: ${hits.toSeq}")
    // probing every cell IS the exact scan: recall 1000 permille structurally
    assert(rows.last._4 == 1000L)
    // and its candidate set is the whole corpus minus the query
    val n = Tables.embeddings(spark, sf()).count()
    assert(rows.last._2 == n - 1)
  }
}
