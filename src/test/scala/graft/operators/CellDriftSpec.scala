package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Drift-monitor invariants over the integer face + the derived KL helper:
  * the two cohorts partition the corpus, the totals columns are consistent
  * constants, every smoothed KL term is finite (the add-one smoothing's
  * whole point), the global KL sum is non-negative (Gibbs' inequality for
  * smoothed distributions), and a balanced cell under equal totals drifts
  * exactly zero. The kl_term itself moved OUT of the hash-gated face in
  * round 15 (transcendental `ln` is not cross-engine bit-guaranteed), so
  * these pins are the float column's correctness contract.
  */
class CellDriftSpec extends SparkSpec {
  import spark.implicits._

  test("cohorts partition the corpus, totals are consistent, KL terms finite") {
    val d = Similarity.semanticCellDrift(spark, sf()).cache()
    val n = graft.core.Tables.embeddings(spark, sf()).count()
    assert(d.agg(sum(col("n_ref") + col("n_cur"))).as[Long].head() == n)
    // the window totals equal the recomputed sums on every row
    val tr = d.agg(sum("n_ref")).as[Long].head()
    val tc = d.agg(sum("n_cur")).as[Long].head()
    val nc = d.count()
    assert(d.where(col("tot_ref") =!= tr || col("tot_cur") =!= tc ||
      col("n_cells") =!= nc).count() == 0)
    val k = Similarity.withKlTerm(d)
    assert(k.where(isnan(col("kl_term")) ||
      col("kl_term") === Double.PositiveInfinity ||
      col("kl_term") === Double.NegativeInfinity).count() == 0)
    // Gibbs: sum_c pc ln(pc/pr) >= 0 for any two distributions
    assert(k.agg(sum("kl_term")).as[Double].head() >= -1e-12)
  }

  test("identical cohorts drift zero in every cell") {
    // n_ref == n_cur and tot_ref == tot_cur forces pr == pc, ln(1) = 0 —
    // pin it on the cells where the parity split happens to balance
    val d = Similarity.withKlTerm(
      Similarity.semanticCellDrift(spark, sf())).cache()
    val balanced = d.where(col("n_ref") === col("n_cur"))
    val trEqTc = d.agg(sum("n_ref")).as[Long].head() == d.agg(sum("n_cur")).as[Long].head()
    if (trEqTc)
      assert(balanced.where(col("kl_term") =!= 0.0).count() == 0)
    else // totals differ: balanced cells still drift slightly; just sanity
      assert(balanced.where(abs(col("kl_term")) > 0.01).count() == 0)
  }

  test("hand-computed KL term on a tiny frame") {
    // cells (0,1): ref counts (3,1), cur counts (1,3) — smoothed
    // pr0=(3+1)/(4+2)=2/3, pc0=(1+1)/(4+2)=1/3, kl0=1/3*ln(1/2)
    val tiny = Seq((0, 3L, 1L, 4L, 4L, 2L), (1, 1L, 3L, 4L, 4L, 2L))
      .toDF("cell", "n_ref", "n_cur", "tot_ref", "tot_cur", "n_cells")
    val k = Similarity.withKlTerm(tiny).orderBy("cell")
      .select("kl_term").as[Double].collect()
    assert(math.abs(k(0) - (1.0 / 3.0) * math.log(0.5)) < 1e-15)
    assert(math.abs(k(1) - (2.0 / 3.0) * math.log(2.0)) < 1e-15)
  }
}
