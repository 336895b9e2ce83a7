package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup

/** The composed streaming→analytics pin: a corpus landed through
  * StreamIngest micro-batches must produce the IDENTICAL dedup funnel as
  * the batch-loaded source — the reference's buffered-write
  * indistinguishability promise (writable_cache.rs:248-298) stated at the
  * analytics layer, not just per-read.
  */
@graft.SlowTest
class StreamedReportSpec extends SparkSpec {

  test("dedup report over the stream-landed table equals the batch report row-for-row") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val streamed = rows(Dedup.dedupReportStreamed(spark, sf()))
    val batch = rows(Dedup.dedupReport(spark, sf()))
    assert(streamed == batch,
      s"streamed funnel diverged from batch: streamed=$streamed batch=$batch")
    assert(streamed.map(_._1) == Seq("1_docs", "2_exact_groups", "3_normalized_groups",
      "4_lsh_candidates", "5_verified_pairs", "6_clusters", "7_clustered_docs"))
  }

  test("the landed table really arrived in multiple micro-batch appends") {
    val root = Dedup.streamedDocumentsRoot(spark, sf())
    val t = graft.core.VectorTable.open(spark, s"$root/table")
    assert(t.manifest.batches.size > 1,
      s"expected multiple micro-batch appends, got ${t.manifest.batches.size}")
    assert(t.length == graft.core.Tables.documents(spark, sf()).count())
  }
}
