package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Greedy sequence-packing invariants (the properties a training pipeline
  * relies on, independent of the oracle's value-level replay):
  *   - budget: every bin holds ≤ packBudget tokens UNLESS it is a single
  *     oversize doc (packing never splits a doc);
  *   - completeness: every document lands in exactly one bin;
  *   - contiguity: within a shard, bins cover doc_id-ordered runs — bin
  *     b+1's first doc follows bin b's last;
  *   - greediness: no bin could have absorbed its successor's first doc
  *     (fill + next first-doc tokens > budget), i.e. bins are maximal.
  */
class PackSequencesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bins = TextOps.packSequences(spark, sf()).cache()
  private lazy val docs = graft.core.Tables.documents(spark, sf())
    .select(col("doc_id"), size(TextOps.tokens("text")).as("n_tokens"))
    .withColumn("shard", (col("doc_id") % TextOps.packShards).cast("int"))
    .cache()

  test("every bin fits the budget unless it is a single oversize doc") {
    val over = bins.where(col("bin_tokens") > TextOps.packBudget && col("n_docs") =!= 1)
    assert(over.count() == 0)
  }

  test("every document lands in exactly one bin") {
    val nDocs = docs.count()
    assert(bins.agg(sum("n_docs")).as[Long].head() == nDocs)
    assert(bins.agg(sum("bin_tokens")).as[Long].head() ==
      docs.agg(sum(col("n_tokens").cast("long"))).as[Long].head())
  }

  test("bins are contiguous doc_id runs within each shard") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("bin")
    val gaps = bins
      .withColumn("prev_last", lag(col("last_doc"), 1).over(w))
      .where(col("prev_last").isNotNull)
      .join(docs.select(col("shard"), col("doc_id"), col("n_tokens")),
        Seq("shard"))
      .where(col("doc_id") > col("prev_last") && col("doc_id") < col("first_doc"))
    assert(gaps.count() == 0, "a doc_id between two bins belongs to neither")
  }

  test("bins are maximal: the successor bin's first doc would not have fit") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("bin")
    val firstTok = docs.select(col("shard"), col("doc_id").as("first_doc"),
      col("n_tokens").as("first_tokens"))
    val nonGreedy = bins
      .withColumn("next_first", lead(col("first_doc"), 1).over(w))
      .where(col("next_first").isNotNull)
      .join(firstTok.withColumnRenamed("first_doc", "nf"),
        col("next_first") === col("nf") &&
          bins("shard") === firstTok("shard"))
      .where(col("bin_tokens") + col("first_tokens") <= TextOps.packBudget)
    assert(nonGreedy.count() == 0, "a bin closed although its successor's first doc fit")
  }
}
