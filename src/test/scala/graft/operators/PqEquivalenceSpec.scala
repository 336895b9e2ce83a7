package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The declared PQ queries use the map-only literal-codebook form (no
  * shuffle); the oracle SQL mirrors the relational scaffold (explode ×
  * broadcast anchors × window argmin). This spec proves the two paths are
  * value-identical — codes exactly, ADC distances bit-for-bit — so the
  * shuffle-free plan cannot drift from the oracle-checked semantics.
  */
class PqEquivalenceSpec extends SparkSpec {

  test("map-only PQ codes equal the relational argmin codes") {
    val mapOnly = Similarity.pqCodes(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val relational = Similarity.pqBest(spark, sf())
      .groupBy("vec_id")
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(m, code))), x -> CAST(x.code AS STRING)), '-')")
        .as("code_str"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(mapOnly == relational)
    assert(mapOnly.nonEmpty)
  }

  test("map-only ADC distances are bit-identical to the relational fold") {
    val mapOnly = Similarity.pqAdcSearch(spark, sf())
      .collect().map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1)))
    val relational = Similarity.pqBest(spark, sf())
      .where(col("vec_id") =!= Similarity.pqQueryId)
      .groupBy("vec_id")
      .agg(expr(
        "aggregate(array_sort(collect_list(struct(m, qdist))), CAST(0 AS DOUBLE), (acc, x) -> acc + x.qdist)")
        .as("adc"))
      .orderBy(col("adc").asc, col("vec_id"))
      .limit(Similarity.pqTopK)
      .collect().map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1)))
    assert(mapOnly.toSeq == relational.toSeq)
  }

  test("fused ADC kernel is bit-identical to the declarative HOF form, all rows") {
    val kernel = Similarity.pqAdcSearch(spark, sf())
      .collect().map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1)))
    val declarative = Similarity.pqAdcSearchDeclarative(spark, sf())
      .collect().map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1)))
    assert(kernel.toSeq == declarative.toSeq)
  }

  test("fused recon-error kernel is bit-identical to the declarative HOF form, all rows") {
    import graft.core.Tables
    val (cb, _) = {
      val emb = Tables.embeddings(spark, sf())
      (emb.where(col("vec_id").between(1L, Similarity.pqK.toLong)).orderBy("vec_id")
        .select("embedding").collect().map(_.getSeq[Float](0).toSeq).toSeq, ())
    }
    val kernel = Tables.embeddings(spark, sf())
      .select(col("vec_id"), graft.functions.VectorFunctions.pqReconErrF(
        col("embedding"), typedLit(cb), Similarity.pqM).as("e"))
      .collect().map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
    val declarative = Tables.embeddings(spark, sf())
      .select(col("vec_id"),
        Similarity.reconErrExpr(typedLit(cb), col("embedding")).as("e"))
      .collect().map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
    assert(kernel.nonEmpty)
    assert(kernel == declarative)
  }

  test("declared PQ plans are shuffle-free (map + TakeOrdered only)") {
    Seq(Similarity.pqCodes(spark, sf()), Similarity.pqAdcSearch(spark, sf())).foreach { df =>
      val plan = df.queryExecution.sparkPlan.treeString
      assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
      assert(!plan.contains("Join"), s"expected no join:\n$plan")
    }
  }
}
