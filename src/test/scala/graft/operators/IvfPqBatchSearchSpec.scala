package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The batched IVF+PQ search must be the single-query [[Similarity.ivfPqSearch]]
  * per query row: same probe cells (in-plan ranking ≡ driver rankedCells),
  * same fused-ADC bits, same (adc, vec_id) order — only the top-k depth
  * differs (batchK per panel query vs pqTopK for the one declared query).
  */
class IvfPqBatchSearchSpec extends SparkSpec {

  test("per-query parity with the single-query IVF+PQ search") {
    val batch = Similarity.ivfPqBatchSearch(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), java.lang.Double.doubleToLongBits(r.getDouble(2))))
    val byQ = batch.groupBy(_._1)
    assert(byQ.keySet == (0L until Similarity.batchPanel).toSet)
    byQ.foreach { case (qid, hits) =>
      assert(hits.length == Similarity.batchK, s"query $qid returned ${hits.length} hits")
    }
    // the panel contains pqQueryId: the batch rows for it must be exactly
    // the single-query search's leading batchK rows, bits and order
    val single = Similarity.ivfPqSearch(spark, sf()).collect()
      .map(r => (r.getLong(0), java.lang.Double.doubleToLongBits(r.getDouble(1))))
      .take(Similarity.batchK)
    val batchQ0 = batch.filter(_._1 == Similarity.pqQueryId)
      .sortBy(t => (java.lang.Double.longBitsToDouble(t._3), t._2))
      .map(t => (t._2, t._3)).toSeq
    assert(batchQ0 == single.toSeq,
      s"IVF+PQ batch rows for qid=${Similarity.pqQueryId} diverge from the single-query search")
  }

  test("plan: broadcast probe join, rank-limit pushdown, no cartesian") {
    val plan = Similarity.ivfPqBatchSearch(spark, sf()).queryExecution.sparkPlan.treeString
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe join:\n$plan")
    assert(plan.contains("Window"), s"expected per-query window top-k:\n$plan")
    // Spark's rank-limit pushdown: only <= batchK candidate rows per query
    // survive each partition BEFORE the qid shuffle — the window state
    // never holds the full candidate set
    assert(plan.contains("WindowGroupLimit"), s"expected rank-limit pushdown:\n$plan")
  }

  test("maxmin seeds: deterministic shape (distinct, sized, first = sample head)") {
    val rnd = new scala.util.Random(5)
    val sample = Array.fill(40)(Array.fill(Similarity.dim)(rnd.nextFloat()))
    val seeds = Similarity.maxminSeeds(sample, 8)
    val seeds2 = Similarity.maxminSeeds(sample, 8)
    assert(seeds.length == 8)
    assert(seeds.map(_.toSeq).toSeq == seeds2.map(_.toSeq).toSeq, "seeding must be deterministic")
    assert(seeds.head.toSeq == sample.head.toSeq, "seed 0 is the sample head")
    assert(seeds.map(_.toSeq).distinct.length == 8, "seeds must be distinct sample points")
  }

  test("hits stay inside each query's driver-ranked probe cells") {
    val emb = graft.core.Tables.embeddings(spark, sf())
    val cellOf = Similarity.ivfAssign(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cs = Similarity.centroids(spark, sf())
    val byQ = Similarity.ivfPqBatchSearch(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    (0L until Similarity.batchPanel).foreach { qid =>
      val q = emb.where(col("vec_id") === qid).select("embedding")
        .head().getSeq[Float](0).toArray
      val probed = Similarity.rankedCells(q, cs).take(Similarity.ivfNprobe).toSet
      val hitCells = byQ(qid).map { case (_, vid) => cellOf(vid) }.toSet
      assert(hitCells.subsetOf(probed),
        s"query $qid: hits from cells $hitCells outside driver-ranked probes $probed")
    }
  }
}
