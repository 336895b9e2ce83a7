package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end LLM training-data cleaning pipeline, composed from the
  * verified operators — the "what this engine is for" query:
  *
  *   1. quality gate  (TextOps-style score ≥ threshold)
  *   2. exact dedup   (md5 grouping, keep lowest doc_id)
  *   3. near-dup drop (MinHash→LSH→Jaccard→connected components; keep each
  *                     cluster's canonical = min doc_id)
  *   4. emit the surviving corpus with token counts
  *
  * Every stage is one of the individually oracle-verified operators; the
  * composition is itself oracle-verified end-to-end. Scale shape: two
  * map-only passes over documents + the dedup shuffles (content-hash, LSH
  * bucket) + the tiny cluster join — nothing quadratic, nothing driver-side.
  */
object Pipeline {

  val minQuality = 0.5

  def cleanCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)

    // 1. quality gate (same arithmetic as TextOps.qualityScores)
    val scored = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("ttr",
        size(array_distinct(col("toks"))).cast("double") / col("n_tokens").cast("double"))
      .withColumn("mean_token_len",
        (col("n_chars").cast("double") - (col("n_tokens").cast("double") - 1.0)) / col("n_tokens").cast("double"))
      .withColumn("stop_ratio",
        expr("CAST(size(filter(toks, t -> t IN ('the','a','of','and'))) AS DOUBLE)") / col("n_tokens").cast("double"))
      .withColumn("quality_score",
        col("ttr") * lit(2.0) + col("mean_token_len") * lit(0.1) - col("stop_ratio"))
      .where(col("quality_score") >= minQuality)
      .select("doc_id", "text", "n_tokens")

    // 2. exact dedup: keep the lowest doc_id per content hash
    val exactKeep = scored
      .withColumn("content_hash", md5(col("text")))
      .withColumn("keep_id", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("content_hash")))
      .where(col("doc_id") === col("keep_id"))
      .select("doc_id", "n_tokens")

    // 3. near-dup canonical filter: drop any doc whose cluster canonical is
    //    a different (lower) doc_id. Clusters come from the verified pairs.
    val clusters = Dedup.duplicateClusters(s, d)
    exactKeep
      .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .where(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .select(col("doc_id"), col("n_tokens"))
  }

  val cleanCorpusSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, text, len(toks) AS n_tokens,
       |    CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 2.0
       |    + (CAST(n_chars AS DOUBLE) - (CAST(len(toks) AS DOUBLE) - 1.0)) / CAST(len(toks) AS DOUBLE) * 0.1
       |    - CAST(len(list_filter(toks, t -> t IN ('the','a','of','and'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
       |      AS quality_score
       |  FROM (SELECT doc_id, text, n_chars, string_split(text, ' ') AS toks FROM documents)),
       | gated AS (
       |  SELECT doc_id, text, n_tokens FROM scored WHERE quality_score >= $minQuality),
       | exact_keep AS (
       |  SELECT doc_id, n_tokens FROM (
       |    SELECT doc_id, n_tokens,
       |      MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
       |    FROM gated) WHERE doc_id = keep_id),
       | clusters AS (${Dedup.duplicateClustersSql.replace("\n", "\n  ")})
       |SELECT e.doc_id, e.n_tokens
       |FROM exact_keep e LEFT JOIN clusters c ON c.id = e.doc_id
       |WHERE c.cluster_id IS NULL OR c.cluster_id = e.doc_id""".stripMargin
}
