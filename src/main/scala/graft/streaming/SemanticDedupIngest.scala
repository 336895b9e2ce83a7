package graft.streaming

import graft.core.VectorTable
import graft.operators.{IvfTableIndex, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** SEMANTIC dedup-at-ingest: streaming append that drops a vector when a
  * KEPT vector already semantically covers it (cosine ≥ threshold within
  * the same IVF cell) — [[DedupIngest]]'s discipline lifted from exact
  * content hashes to embedding similarity. The committed corpus is by
  * construction duplicate-free, so each micro-batch only has to look at
  * (a) batch × committed within cells and (b) batch × batch — never
  * committed × committed, which is what makes continuous semantic dedup
  * linear over time instead of re-running a corpus-wide join per drop.
  *
  * Per micro-batch:
  *   1. assign the batch against the index's FIXED build-time centroids
  *      (the same contract as [[graft.operators.IvfTableIndex.refresh]]);
  *   2. one blocked bipartite pass (the shared hot-bucket-safe kernel)
  *      over (committed ∪ batch) × batch per cell scores every candidate
  *      pair once — NaN-explicit, so zero-norm vectors never match;
  *   3. batch vectors covered by a COMMITTED neighbor drop immediately
  *      (committed rows are all kept, and all have smaller ids);
  *   4. the survivors' in-batch edges run a driver-side GREEDY sweep in
  *      vec_id order (micro-batch-sized by definition — same bounded
  *      fast-path stance as the component pass's union-find);
  *   5. kept rows append; the index refreshes over the appended span.
  *
  * When vectors arrive in vec_id order the landed set is EXACTLY the
  * greedy (lexicographically-first) maximal independent set of the
  * within-cell similarity graph — the unique set that is (i) independent
  * and (ii) every dropped vector has a kept neighbor with a smaller id.
  * That uniqueness is the declared face's gate: the two properties are
  * measured over the full corpus after the stream lands, and TRUE/TRUE
  * pins the whole set without replaying the sequential sweep in SQL
  * (SemanticIngestSpec additionally pins the landed set against an
  * in-test sequential reference).
  */
object SemanticDedupIngest {

  /** One semantically-gated batch append; returns (kept, dropped). */
  def appendDeduped(table: VectorTable, idx: java.util.concurrent.atomic.AtomicReference[IvfTableIndex],
                    batch: DataFrame, threshold: Double,
                    streamBatchId: Option[Long] = None): (Long, Long) = {
    if (streamBatchId.exists(_ <= table.manifest.streamBatch)) return (0L, 0L)
    val total = batch.count()
    if (total == 0) return (0L, 0L)
    val cur = idx.get()
    val sims = Similarity.centroidSimsColumn(cur.centroids)
    val assignedAll = batch.select(col("vec_id"), col("embedding"))
      .withColumn("sims", sims)
      .withColumn("cell",
        (array_position(col("sims"), array_max(col("sims"))) - 1).cast("int"))
      .select(col("vec_id"), col("embedding"), col("cell"))
      .localCheckpoint()

    // BATCH-LEVEL EXACT-VECTOR COLLAPSE (the shared round-11..13
    // discipline): a boilerplate drop — thousands of copies of one
    // vector — would otherwise put C(n,2) in-batch edges through the
    // driver sweep. Identical non-zero vectors can never BOTH be kept
    // (cosine ≈ 1 ≥ any dedup threshold), and a non-rep twin is always
    // suppressed by its min-id rep when the rep is kept, or by whatever
    // smaller kept vector covered the rep when it is not — so the greedy
    // result over reps EXTENDS to members as "never kept", exactly the
    // sequential semantics (SemanticIngestSpec pins a clique batch).
    // Zero-norm vectors have no neighbors at all (NaN cosine): every one
    // of them is kept unconditionally, bypassing the sweep.
    val nz = assignedAll.where(
      expr("aggregate(embedding, 0.0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))") > lit(0.0))
    val zeroKeptIds = assignedAll.select(col("vec_id"))
      .exceptAll(nz.select(col("vec_id"))).collect().map(_.getLong(0)).toSet
    val assigned = nz
      .withColumn("fp", md5(to_json(col("embedding"))))
      .withColumn("rep", min(col("vec_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .where(col("vec_id") === col("rep"))
      .select(col("vec_id"), col("embedding"), col("cell"))
      .localCheckpoint()

    // one blocked bipartite pass: (committed ∪ batch) × batch, per cell
    val committed = cur.data.select(col("vec_id"), col("embedding"), col("cell"))
    val pool = committed.unionByName(assigned)
    val cand = graft.operators.Dedup.deltaPairsBlockedFor(
      pool.select(col("cell"), col("vec_id").as("doc_id")),
      assigned.select(col("cell"), col("vec_id").as("doc_id")), Seq("cell"))
    val emb = pool.select(col("vec_id"), col("embedding"))
    val edges = cand
      .join(emb.select(col("vec_id").as("doc_a"), col("embedding").as("ea")), Seq("doc_a"))
      .join(emb.select(col("vec_id").as("doc_b"), col("embedding").as("eb")), Seq("doc_b"))
      .withColumn("sim", graft.functions.VectorFunctions.cosineF(col("ea"), col("eb")))
      .where(!isnan(col("sim")) && col("sim") >= threshold)
      .select("doc_a", "doc_b")

    val batchIds = assigned.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val pairs = edges.collect().map(r => (r.getLong(0), r.getLong(1)))

    // 3: drop anything covered by a committed (always-kept, smaller-id) row
    val coveredByCommitted = pairs.collect {
      case (a, b) if batchIds(b) && !batchIds(a) => b
      case (a, b) if batchIds(a) && !batchIds(b) => a
    }.toSet
    // 4: greedy sweep in id order over the in-batch survivor graph
    val inBatch = pairs.filter { case (a, b) => batchIds(a) && batchIds(b) }
      .filterNot { case (a, b) => coveredByCommitted(a) || coveredByCommitted(b) }
    val neighbors = inBatch.foldLeft(Map.empty[Long, List[Long]].withDefaultValue(Nil)) {
      case (m, (a, b)) => m.updated(a, b :: m(a)).updated(b, a :: m(b))
    }
    val kept = scala.collection.mutable.Set.empty[Long]
    (batchIds -- coveredByCommitted).toSeq.sorted.foreach { v =>
      if (!neighbors(v).exists(u => u < v && kept(u))) kept += v
    }

    val keptAll = kept.toSet ++ zeroKeptIds
    val keptRows = assignedAll.where(col("vec_id").isInCollection(keptAll))
      .select(col("vec_id"), col("embedding"))
    if (keptAll.nonEmpty) {
      table.append(keptRows, streamBatchId = streamBatchId)
      idx.set(idx.get().refresh(table))
    }
    (keptAll.size.toLong, total - keptAll.size)
  }

  /** Streaming form: every micro-batch lands semantically deduplicated
    * against the committed history plus itself.
    */
  def start(stream: DataFrame, table: VectorTable,
            idx: java.util.concurrent.atomic.AtomicReference[IvfTableIndex],
            threshold: Double, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendDeduped(table, idx, batch, threshold, streamBatchId = Some(batchId)); ()
      }
      .start()
}
