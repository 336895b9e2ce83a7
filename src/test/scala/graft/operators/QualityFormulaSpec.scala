package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-16 ADVICE: ONE quality formula. [[TextOps.withQualityColumns]]
  * is the single builder behind both the batch face
  * ([[TextOps.qualityScores]], stored `n_chars`) and the refinery ingest
  * gate (recomputed `n_chars = length(text)`). This spec pins the one
  * assumption that keeps the two inputs equivalent — the generator's
  * `n_chars` equals `length(text)` — and therefore that both paths score
  * bit-identically.
  */
class QualityFormulaSpec extends SparkSpec {

  test("batch face and gate-shaped input produce bit-identical scores") {
    val docs = graft.core.Tables.documents(spark, sf())
    val batch = TextOps.qualityScores(spark, sf())
      .select(col("doc_id"), col("quality_score").as("qs_batch"))
    // the gate's input shape: toks + n_chars recomputed from the text
    val gate = TextOps.withQualityColumns(
        docs.select(col("doc_id"), col("text"))
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_chars", length(col("text"))))
      .select(col("doc_id"), col("quality_score").as("qs_gate"))
    val diverged = batch.join(gate, "doc_id")
      // bit-exact: compare the raw double bits, not an epsilon
      .where(expr("CAST(qs_batch AS STRING) <> CAST(qs_gate AS STRING)") ||
        col("qs_batch").isNull =!= col("qs_gate").isNull)
      .count()
    assert(diverged == 0L, s"$diverged docs score differently between paths")
    assert(batch.count() == docs.count())
  }
}
