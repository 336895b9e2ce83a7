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
