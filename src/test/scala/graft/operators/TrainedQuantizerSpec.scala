package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained (k-means) IVF centroids and PQ codebooks: shape, quality vs the
  * deterministic anchor baselines (the oracle-pinned invariants), and the
  * oracle-falsifiable comparison queries themselves.
  */
class TrainedQuantizerSpec extends SparkSpec {

  test("trained IVF centroids have the index's shape") {
    val cs = Similarity.trainedCentroids(spark, sf())
    assert(cs.length == Similarity.cellsFor(
      graft.core.Tables.embeddings(spark, sf()).count()))
    assert(cs.forall(_.length == Similarity.dim))
    // centroids are distinct points, not a collapsed fit
    assert(cs.map(_.toSeq).distinct.length == cs.length)
  }

  test("ann_ivf_trained_recall: trained panel recall >= anchor at equal nprobe") {
    val row = Similarity.ivfTrainedRecall(spark, sf()).head()
    assert(row.getAs[Int]("k") == Similarity.ivfK)
    assert(row.getAs[Int]("n_queries") == Similarity.panelSize)
    val hits = row.getAs[Long]("anchor_hits")
    val anchor = row.getAs[Double]("anchor_recall")
    assert(anchor == hits.toDouble / (Similarity.ivfK * Similarity.panelSize))
    assert(anchor >= 0.0 && anchor <= 1.0)
    assert(row.getAs[Boolean]("trained_ge_anchor"))
    // the HONEST comparison, behind the query's anchor-fallback serving
    // policy: on the gate corpora the trained set must genuinely win —
    // a training regression fails HERE (debuggable), not in the hash gate
    // (where a sample-unlucky corpus would be indistinguishable)
    val (aHits, tHits) = Similarity.trainedVsAnchorHits(spark, sf())
    assert(aHits == hits)
    assert(tHits >= aHits,
      s"Lloyd-trained centroids must reach the anchor panel baseline ($tHits < $aHits)")
  }

  test("trained PQ codebook has the composite shape and beats anchors on error") {
    val book = Similarity.trainedPqCodebook(spark, sf())
    assert(book.length == Similarity.pqK)
    assert(book.forall(_.length == Similarity.dim))
    val row = Similarity.pqTrainedError(spark, sf()).head()
    assert(row.getAs[Long]("n_vectors") ==
      graft.core.Tables.embeddings(spark, sf()).count())
    assert(row.getAs[Boolean]("trained_le_anchor"))
    // honest comparison behind the fallback (see recall test above)
    val (n, anchorErr, trainedErr) = Similarity.pqTrainedVsAnchorError(spark, sf())
    assert(n == row.getAs[Long]("n_vectors"))
    assert(trainedErr.compareTo(anchorErr) <= 0,
      s"k-means codebooks must not exceed anchor reconstruction error ($trainedErr > $anchorErr)")
  }
}
