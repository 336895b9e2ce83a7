package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curriculum-export invariants beyond the oracle's value replay:
  *   - the schedule is a CURRICULUM: within every shard, bins walk
  *     quality buckets non-decreasing (bin b's ckey_hi ≤ bin b+1's
  *     ckey_lo never needs to hold — buckets may straddle bins — but the
  *     POSITION order must: first_pos ranges are contiguous and ckey_lo
  *     is non-decreasing across bins);
  *   - completeness: every doc lands once, token mass preserved;
  *   - budget: every bin ≤ packBudget unless single-doc.
  */
class CurriculumExportSpec extends SparkSpec {
  import spark.implicits._

  private lazy val m = TextOps.curriculumExportManifest(spark, sf()).cache()
  private lazy val docs = graft.core.Tables.documents(spark, sf())
    .select(col("doc_id"), size(TextOps.tokens("text")).as("n_tokens")).cache()

  test("bins are contiguous pos runs walking non-decreasing quality buckets") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("bin")
    val seq = m
      .withColumn("prev_last_pos", lag(col("last_pos"), 1).over(w))
      .withColumn("prev_ckey_hi", lag(col("ckey_hi"), 1).over(w))
      .where(col("prev_last_pos").isNotNull)
    assert(seq.where(col("first_pos") =!= col("prev_last_pos") + 1).count() == 0,
      "bins must cover contiguous pos runs")
    assert(seq.where(col("ckey_lo") < col("prev_ckey_hi")).count() == 0,
      "pos order must walk quality buckets ascending (curriculum)")
  }

  test("every doc lands once and token mass is preserved") {
    assert(m.agg(sum("n_docs")).as[Long].head() == docs.count())
    assert(m.agg(sum("bin_tokens")).as[Long].head() ==
      docs.agg(sum(col("n_tokens").cast("long"))).as[Long].head())
  }

  test("bins respect the budget unless single-doc") {
    assert(m.where(col("bin_tokens") > TextOps.packBudget && col("n_docs") =!= 1)
      .count() == 0)
  }
}
