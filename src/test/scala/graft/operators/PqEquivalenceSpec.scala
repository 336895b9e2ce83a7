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

  test("IVF+PQ search: members come only from probed cells, ADC bits match the kernel") {
    import graft.core.Tables
    val combined = Similarity.ivfPqSearch(spark, sf())
      .collect().map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1)))
    assert(combined.nonEmpty)
    // Every hit sits in one of the nprobe cells nearest the PQ query —
    // pruning really pruned (and didn't leak unprobed cells in).
    val cellOf = Similarity.ivfAssign(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qCell = cellOf(Similarity.pqQueryId)
    val hitCells = combined.map { case (id, _) => cellOf(id) }.toSet
    assert(hitCells.contains(qCell), s"query's own cell $qCell absent from hits $hitCells")
    assert(hitCells.size <= Similarity.ivfNprobe, s"hits span ${hitCells.size} cells > nprobe")
    // ADC distances are the SAME bits the full (unpruned) kernel computes —
    // pruning changes which rows are ranked, never a distance value.
    val (cb, q) = {
      val emb = Tables.embeddings(spark, sf())
      (emb.where(col("vec_id").between(1L, Similarity.pqK.toLong)).orderBy("vec_id")
        .select("embedding").collect().map(_.getSeq[Float](0).toSeq).toSeq,
        emb.where(col("vec_id") === Similarity.pqQueryId)
          .select("embedding").head().getSeq[Float](0).toSeq)
    }
    val ids = combined.map(_._1)
    val direct = Tables.embeddings(spark, sf())
      .where(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), graft.functions.VectorFunctions.pqAdcF(
        col("embedding"), typedLit(cb), typedLit(q), Similarity.pqM).as("adc"))
      .collect().map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
    combined.foreach { case (id, bits) => assert(direct(id) == bits, s"ADC drift for vec $id") }
    // Plan sanity: pruning is a (broadcastable) semi-join, never a cartesian.
    val plan = Similarity.ivfPqSearch(spark, sf()).queryExecution.sparkPlan.treeString
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
    assert(plan.contains("LeftSemi"), s"expected semi-join pruning:\n$plan")
  }
}
