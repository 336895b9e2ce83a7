package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN serving: an unbounded stream of query vectors answered
  * against the static corpus — the online face of the batched IVF search
  * (the reference serves point reads online through its cache stack,
  * src/cache/readable_cache.rs:21-52; similarity queries get the same
  * treatment here).
  *
  * Shape: `foreachBatch` runs [[graft.operators.Similarity.ivfBatchSearchOf]]
  * on each micro-batch — the SAME plan the declared `ann_ivf_batch_search`
  * query uses (probe-cell ranking in-plan per query row, candidates via the
  * cell join, per-query windowed top-k), so batch/stream parity is
  * structural, not re-implemented. Per micro-batch cost: candidates ≈
  * corpus × nprobe/cells regardless of batch size; the centroid set is a
  * cached ≤1 MB literal, re-broadcast per batch.
  *
  * foreachBatch rather than a stream-static join + window because windows
  * over streams require watermark-bounded state in append mode — but a
  * top-k per query needs no cross-batch state at all (each query is
  * answered entirely within its arrival batch), so the batch plan inside
  * foreachBatch is the tighter formulation: no state store, no watermark
  * latency, exactly the serving semantics an inference endpoint wants.
  */
object AnnServe {

  /** Start serving: `queries` is a streaming frame with (qid BIGINT,
    * embedding ARRAY<FLOAT>); each micro-batch's top-k rows (qid, vec_id,
    * sim|adc) are handed to `sink` with the stream batch id.
    *
    * `usePq = true` serves through [[graft.operators.Similarity.ivfPqBatchSearchOf]]
    * — same probe/candidate plan, ADC ranking against the literal codebook
    * instead of exact cosine: the configuration for corpora where raw
    * vectors blow the per-batch scan budget (the kernel reads candidates
    * once either way; ADC is the cheaper rank at equal candidates).
    *
    * `trainedIndex = Some(idx)` serves through a TRAINED persisted
    * [[graft.operators.IvfTableIndex]]
    * ([[graft.operators.Similarity.ivfIndexBatchSearchOf]]): probe ranking
    * against the index's Lloyd-trained centroids, candidates from the
    * persisted cell assignment — the quality configuration end-to-end
    * online. Takes precedence over `usePq`.
    *
    * `filtered = true` serves each micro-batch through the metadata-
    * FILTERED batch search ([[graft.operators.Similarity.ivfFilteredBatchSearchOf]]):
    * per-query adaptive probing against the filtered cell cardinalities,
    * entirely in-plan — the online form of "nearest neighbors matching a
    * predicate". Takes precedence over `usePq`; `trainedIndex` still wins.
    *
    * Streaming qids are REQUEST ids, not corpus ids, so serving never
    * self-excludes: a query whose qid coincides with a corpus vec_id still
    * sees that vector as a neighbor (the declared batch queries, whose
    * panel qids ARE corpus ids, pass excludeSelf = true instead).
    */
  def start(queries: DataFrame, corpusDir: String, usePq: Boolean = false,
            trainedIndex: Option[graft.operators.IvfTableIndex] = None,
            filtered: Boolean = false)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val answer = trainedIndex match {
          case Some(idx) => graft.operators.Similarity.ivfIndexBatchSearchOf(
            idx, batch, excludeSelf = false)
          case None if filtered => graft.operators.Similarity.ivfFilteredBatchSearchOf(
            batch.sparkSession, corpusDir, batch, excludeSelf = false)
          case None if usePq => graft.operators.Similarity.ivfPqBatchSearchOf(
            batch.sparkSession, corpusDir, batch, excludeSelf = false)
          case None => graft.operators.Similarity.ivfBatchSearchOf(
            batch.sparkSession, corpusDir, batch, excludeSelf = false)
        }
        sink(answer, batchId)
      }
      .start()
}
