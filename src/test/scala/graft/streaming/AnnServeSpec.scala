package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class AnnQuery(qid: Long, embedding: Seq[Float])

/** Streaming ANN serving parity: every micro-batch of query vectors gets
  * exactly the answer the batch search gives for the same queries — no
  * cross-batch state, no drift between the online and offline paths.
  */
@graft.SlowTest
class AnnServeSpec extends SparkSpec {

  test("micro-batches are answered identically to the batch search, batch by batch") {
    import spark.implicits._
    val emb = graft.core.Tables.embeddings(spark, sf())
      .orderBy("vec_id").limit(12)
      .collect().map(r => AnnQuery(r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[AnnQuery](spark)
    val got = scala.collection.mutable.Map[Long, Set[(Long, Long, Long)]]()
    val q = AnnServe.start(input.toDF(), sf()) { (res, id) =>
      got.synchronized {
        got(id) = res.collect()
          .map(r => (r.getLong(0), r.getLong(1),
            java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
      }
    }
    try {
      input.addData(emb.take(4))      // batch 0: panel queries 0..3
      q.processAllAvailable()
      input.addData(emb.slice(8, 12)) // batch 1: disjoint queries 8..11
      q.processAllAvailable()
    } finally q.stop()

    // serving parity target: the same entry point with the same serving
    // semantics (no self-exclusion — streaming qids are request ids)
    def batchAnswer(qs: Seq[AnnQuery]): Set[(Long, Long, Long)] =
      graft.operators.Similarity.ivfBatchSearchOf(
          spark, sf(), qs.toDF().select(col("qid"), col("embedding")), excludeSelf = false)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet

    assert(got.keySet == Set(0L, 1L))
    assert(got(0L) == batchAnswer(emb.take(4).toSeq), "batch 0 diverged from offline answer")
    assert(got(1L) == batchAnswer(emb.slice(8, 12).toSeq), "batch 1 diverged from offline answer")
    // every served query got exactly batchK results
    got.values.flatten.groupBy(_._1).foreach { case (qid, hits) =>
      assert(hits.size == graft.operators.Similarity.batchK, s"query $qid: ${hits.size} hits")
    }
    // no self-exclusion in serving: these queries ARE corpus vectors, so
    // each one's own vec_id must appear as its (exact-match) top neighbor
    got.values.flatten.groupBy(_._1).foreach { case (qid, hits) =>
      assert(hits.exists(_._2 == qid),
        s"query $qid: corpus vector with the same id missing from served neighbors")
    }
  }

  test("PQ mode serves the IVF+PQ batch answer, batch by batch") {
    import spark.implicits._
    val emb = graft.core.Tables.embeddings(spark, sf())
      .orderBy("vec_id").limit(6)
      .collect().map(r => AnnQuery(r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[AnnQuery](spark)
    val got = scala.collection.mutable.Map[Long, Set[(Long, Long, Long)]]()
    val q = AnnServe.start(input.toDF(), sf(), usePq = true) { (res, id) =>
      got.synchronized {
        got(id) = res.collect()
          .map(r => (r.getLong(0), r.getLong(1),
            java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
      }
    }
    try {
      input.addData(emb.take(6))
      q.processAllAvailable()
    } finally q.stop()
    val want = graft.operators.Similarity.ivfPqBatchSearchOf(
        spark, sf(), emb.take(6).toSeq.toDF().select(col("qid"), col("embedding")),
        excludeSelf = false)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
    assert(got.keySet == Set(0L))
    assert(got(0L) == want, "PQ-mode stream diverged from the offline IVF+PQ batch answer")
  }

  test("filtered mode serves the filtered batch answer; every hit satisfies the predicate") {
    import spark.implicits._
    val emb = graft.core.Tables.embeddings(spark, sf())
      .orderBy("vec_id").limit(6)
      .collect().map(r => AnnQuery(r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[AnnQuery](spark)
    val got = scala.collection.mutable.Map[Long, Set[(Long, Long, Long)]]()
    val q = AnnServe.start(input.toDF(), sf(), filtered = true) { (res, id) =>
      got.synchronized {
        got(id) = res.collect()
          .map(r => (r.getLong(0), r.getLong(1),
            java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
      }
    }
    try {
      input.addData(emb.take(6))
      q.processAllAvailable()
    } finally q.stop()
    val want = graft.operators.Similarity.ivfFilteredBatchSearchOf(
        spark, sf(), emb.take(6).toSeq.toDF().select(col("qid"), col("embedding")),
        excludeSelf = false)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
    assert(got.keySet == Set(0L))
    assert(got(0L) == want, "filtered-mode stream diverged from the offline filtered batch answer")
    // predicate purity: every served neighbor carries the filter label
    val labelOf = graft.core.Tables.embeddings(spark, sf())
      .select("vec_id", "label").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.values.flatten.foreach { case (qid, vid, _) =>
      assert(labelOf(vid) == graft.operators.Similarity.filterLabel,
        s"query $qid served neighbor $vid outside the predicate")
    }
  }

  test("trained-index mode serves the persisted trained index's batch answer") {
    import spark.implicits._
    val idx = graft.operators.Similarity.trainedIvfIndexFor(spark, sf())
    val emb = graft.core.Tables.embeddings(spark, sf())
      .orderBy("vec_id").limit(6)
      .collect().map(r => AnnQuery(r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[AnnQuery](spark)
    val got = scala.collection.mutable.Map[Long, Set[(Long, Long, Long)]]()
    val q = AnnServe.start(input.toDF(), sf(), trainedIndex = Some(idx)) { (res, id) =>
      got.synchronized {
        got(id) = res.collect()
          .map(r => (r.getLong(0), r.getLong(1),
            java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
      }
    }
    try {
      input.addData(emb.take(6))
      q.processAllAvailable()
    } finally q.stop()
    // parity target: the SAME persisted index's offline batch search — the
    // serving path the declared ann_ivf_index_search_trained face gates
    val want = graft.operators.Similarity.ivfIndexBatchSearchOf(
        idx, emb.take(6).toSeq.toDF().select(col("qid"), col("embedding")),
        excludeSelf = false)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
    assert(got.keySet == Set(0L))
    assert(got(0L) == want,
      "trained-index stream diverged from the offline trained-index batch answer")
    // and the declared face's own invariants hold here too
    val face = graft.operators.Similarity.ivfTrainedIndexSearch(spark, sf()).head()
    assert(face.getBoolean(3), "persisted trained index != in-memory trained serving")
    assert(face.getLong(2) ==
      graft.operators.Similarity.batchK.toLong * graft.operators.Similarity.batchPanel)
  }
}
