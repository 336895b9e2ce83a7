package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The batched IVF search ranks probe cells INSIDE the plan (per query
  * row) where the single-query searches rank on the driver. This spec pins
  * that the two rankings agree query-for-query, that per-query results are
  * complete and cell-bounded, and that the plan has the intended shape
  * (broadcast probe side, windowed per-query top-k, no cartesian).
  */
class IvfBatchSearchSpec extends SparkSpec {

  test("batch search: per-query hits are complete, cell-bounded, and match driver cell ranking") {
    val rows = Similarity.ivfBatchSearch(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == (0L until Similarity.batchPanel).toSet)
    byQ.foreach { case (qid, hits) =>
      assert(hits.length == Similarity.batchK, s"query $qid returned ${hits.length} hits")
    }
    // distributed probe ranking == driver rankedCells for every panel query
    val emb = graft.core.Tables.embeddings(spark, sf())
    val cellOf = Similarity.ivfAssign(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cs = Similarity.centroids(spark, sf())
    (0L until Similarity.batchPanel).foreach { qid =>
      val q = emb.where(col("vec_id") === qid).select("embedding")
        .head().getSeq[Float](0).toArray
      val probed = Similarity.rankedCells(q, cs).take(Similarity.ivfNprobe).toSet
      val hitCells = byQ(qid).map { case (_, vid, _) => cellOf(vid) }.toSet
      assert(hitCells.subsetOf(probed),
        s"query $qid: hits from cells $hitCells outside driver-ranked probes $probed")
    }
    // sims are the shared kernel's bits
    val ids = rows.map(_._2).distinct
    val embMap = emb.where(col("vec_id").isin(ids ++ (0L until Similarity.batchPanel): _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    rows.foreach { case (qid, vid, sim) =>
      val direct = emb.where(col("vec_id") === vid)
        .select(graft.functions.VectorFunctions.cosineF(
          col("embedding"), lit(embMap(qid))).as("s"))
        .head().getDouble(0)
      assert(java.lang.Double.doubleToLongBits(direct) == java.lang.Double.doubleToLongBits(sim),
        s"sim drift for ($qid, $vid)")
    }
  }

  test("batch search plan: broadcast probe join, windowed top-k, no cartesian") {
    val plan = Similarity.ivfBatchSearch(spark, sf()).queryExecution.sparkPlan.treeString
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe join:\n$plan")
    assert(plan.contains("Window"), s"expected per-query window top-k:\n$plan")
    assert(!plan.contains("GlobalSort") && !plan.contains("Sort [sim"), "no global sort expected")
  }
}
