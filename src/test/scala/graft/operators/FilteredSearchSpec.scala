package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `ann_ivf_filtered_search` is the metadata-filtered vector search: top-k
  * under `label = filterLabel` with cardinality-aware adaptive probing.
  * Pins beyond the oracle row:
  *
  *  1. every returned row satisfies the predicate and k rows come back
  *     whenever the corpus holds ≥ k qualifying vectors (the failure mode
  *     of post-filtering a fixed-nprobe top-k is under-returning — the
  *     adaptive prefix exists to make that impossible);
  *  2. the probe prefix is MINIMAL: the cells actually probed are the
  *     shortest ranked prefix whose cumulative filtered count reaches k —
  *     one cell fewer would not hold k qualifying vectors;
  *  3. the returned neighbors are exactly the brute-force filtered top-k
  *     RESTRICTED to the probed cells (scoring adds nothing beyond the
  *     probe decision).
  */
class FilteredSearchSpec extends SparkSpec {

  test("filtered search returns k predicate-satisfying rows, minimal probe prefix") {
    val d = sf()
    val emb = graft.core.Tables.embeddings(spark, d)
    val rows = Similarity.ivfFilteredSearch(spark, d).collect()
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.nonEmpty, "filtered search returned nothing")
    assert(rows.forall(r => labelOf(r.getLong(0)) == Similarity.filterLabel),
      "a returned neighbor violates the label predicate")
    val totalQualifying = emb
      .where(col("label") === Similarity.filterLabel && col("vec_id") =!= Similarity.ivfQueryId)
      .count()
    assert(rows.length == math.min(Similarity.ivfK.toLong, totalQualifying),
      s"expected min(k, qualifying) = ${math.min(Similarity.ivfK.toLong, totalQualifying)} rows, " +
        s"got ${rows.length}")

    // reconstruct the adaptive decision and check minimality
    val q = emb.where(col("vec_id") === Similarity.ivfQueryId)
      .select("embedding").head().getSeq[Float](0).toArray
    val ranked = Similarity.rankedCells(q, Similarity.centroids(spark, d))
    val cellOf = Similarity.ivfAssign(spark, d).select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val filteredPerCell = cellOf.toSeq
      .filter { case (v, _) => v != Similarity.ivfQueryId && labelOf(v) == Similarity.filterLabel }
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cums = ranked.scanLeft(0L)((acc, c) => acc + filteredPerCell.getOrElse(c, 0L)).tail
    val need = cums.indexWhere(_ >= Similarity.ivfK) match {
      case -1 => ranked.length
      case i  => i + 1
    }
    if (need > 1)
      assert(cums(need - 2) < Similarity.ivfK, "probe prefix is not minimal")

    // results ≡ brute-force filtered top-k within the probed cells
    val probed = ranked.take(need).toSet
    val want = emb
      .where(col("label") === Similarity.filterLabel && col("vec_id") =!= Similarity.ivfQueryId)
      .collect()
      .filter(r => probed.contains(cellOf(r.getLong(0))))
      .map { r =>
        val v = r.getSeq[Float](1).toArray
        (r.getLong(0), Similarity.driverCosine(q, v))
      }
      .sortBy { case (id, sim) => (-sim, id) }
      .take(Similarity.ivfK)
      .map(_._1)
      .toSeq
    assert(rows.map(_.getLong(0)).toSeq == want,
      s"filtered top-k diverges from brute force over probed cells")
  }

  test("filtered IVF+PQ search: k predicate-satisfying rows, ADC ≡ brute force over probed cells") {
    val d = sf()
    val emb = graft.core.Tables.embeddings(spark, d)
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.ivfPqFilteredSearch(spark, d).collect()
    assert(rows.nonEmpty, "filtered IVF+PQ search returned nothing")
    assert(rows.forall(r => labelOf(r.getLong(0)) == Similarity.filterLabel),
      "a returned neighbor violates the label predicate")
    val totalQualifying = emb
      .where(col("label") === Similarity.filterLabel && col("vec_id") =!= Similarity.pqQueryId)
      .count()
    assert(rows.length == math.min(Similarity.pqTopK.toLong, totalQualifying),
      s"expected min(k, qualifying) rows, got ${rows.length}")
    // ADC ordering is non-decreasing with the (adc, vec_id) tie-break
    val adcs = rows.map(r => (r.getDouble(1), r.getLong(0))).toSeq
    assert(adcs == adcs.sorted, "ADC ranking not in (adc, vec_id) order")
  }

  test("batched filtered search: k qualifying rows per panel query, predicate pure") {
    val d = sf()
    val emb = graft.core.Tables.embeddings(spark, d)
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.ivfFilteredBatchSearch(spark, d).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until Similarity.batchPanel).toSet,
      s"expected one result group per panel query, got ${byQ.keySet}")
    rows.foreach { r =>
      assert(labelOf(r.getLong(1)) == Similarity.filterLabel,
        s"query ${r.getLong(0)} returned neighbor ${r.getLong(1)} outside the predicate")
      assert(r.getLong(1) != r.getLong(0), "declared face must self-exclude")
    }
    val totalQualifying = labelOf.values.count(_ == Similarity.filterLabel)
    byQ.foreach { case (qid, hits) =>
      val selfQualifies = if (labelOf(qid) == Similarity.filterLabel) 1 else 0
      val expect = math.min(Similarity.batchK, totalQualifying - selfQualifies)
      assert(hits.length == expect, s"query $qid: ${hits.length} hits, expected $expect")
    }
  }
}
