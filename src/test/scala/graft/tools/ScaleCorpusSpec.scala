package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 10×-replica scale corpus must scale LINEARLY by construction:
  * key-offset replicas are self-contained sub-corpora, so equi-joins grow
  * k× (not k²×) and the dedup families never see cross-replica candidate
  * pairs. This spec pins the replication methodology the sf1 bench scale
  * point (BENCH_DETAIL_sf1.json) stands on.
  */
class ScaleCorpusSpec extends SparkSpec {

  test("key-offset replication: k× rows, k× join output, no cross-replica dedup pairs") {
    val src = sf() // sf0.001
    val dir = ScaleCorpus.build(spark, src)
    val k = ScaleCorpus.replicas

    // row counts: replicated tables k×, shared vocabulary tables 1×
    def n(d: String, t: String): Long = spark.read.parquet(s"$d/$t.parquet").count()
    Seq("customer", "orders", "lineitem", "events", "documents", "embeddings")
      .foreach(t => assert(n(dir, t) == k * n(src, t), s"$t not ${k}x"))
    Seq("region", "nation").foreach(t => assert(n(dir, t) == n(src, t), s"$t replicated"))

    // the fact equi-join grows exactly k× — key offsetting keeps replicas
    // self-contained (naive duplication would grow it k²×)
    def joinN(d: String): Long = {
      val o = spark.read.parquet(s"$d/orders.parquet")
      val l = spark.read.parquet(s"$d/lineitem.parquet")
      l.join(o, col("l_orderkey") === col("o_orderkey")).count()
    }
    assert(joinN(dir) == k * joinN(src), "join output must scale exactly kx")

    // dedup methodology: replica-prefixed tokens give disjoint shingle
    // universes, so every exact-join candidate pair stays within one
    // replica block — the near-dup structure grows linearly with k
    val dk = spark.read.parquet(s"$src/documents.parquet")
      .agg(max("doc_id")).head().getLong(0) + 1L
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextFunctions.shingleHashes(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
    val cross = graft.operators.Dedup.exactJoinProbeCandidates(docs)
      .where((col("doc_a") / dk).cast("long") =!= (col("doc_b") / dk).cast("long"))
      .count()
    assert(cross == 0L, s"$cross cross-replica candidate pairs — replicas not disjoint")
  }
}
