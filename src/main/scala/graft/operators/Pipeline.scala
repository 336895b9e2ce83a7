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

  /** Leakage-safe train/val/test split: the split key is the document's
    * near-dup CLUSTER CANONICAL, not the document — two near-duplicate
    * docs can never straddle train and eval (the train/test-contamination
    * failure mode dedup exists to prevent; splitting by doc hash alone
    * re-introduces it through surviving near-dup pairs). Singleton docs
    * are their own canonical.
    *
    * Deterministic: the 90/5/5 assignment hashes md5(canonical ∥ 'split')
    * — content-stable, seedless, the [[graft.operators.TextOps]] sampling
    * convention. Scale shape: the cluster map is candidate-graph-sized
    * (orders of magnitude under the corpus, AQE broadcasts it), the split
    * tag is a map-side expression, and the final aggregate has 3 groups.
    * The leakage guarantee is STRUCTURAL (split = f(canonical)), so the
    * oracle needs no straddle check — it recomputes the same counts.
    */
  def leakageSafeSplits(s: SparkSession, d: String): DataFrame = {
    val clusters = Dedup.duplicateClusters(s, d)
    val canon = Tables.documents(s, d).select("doc_id")
      .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("canon"))
    canon
      .withColumn("h", expr(
        "pmod(CAST(conv(substr(md5(concat(CAST(canon AS STRING), 'split')), 1, 13), 16, 10) AS BIGINT), 100)"))
      .withColumn("split",
        when(col("h") < 90, "train").when(col("h") < 95, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("canon")).as("n_clusters"))
  }

  /** The refinery end-to-end: the CLEANED corpus (quality gate → exact
    * dedup → near-dup canonical filter, i.e. [[cleanCorpus]]'s survivors)
    * routed through the leakage-safe split, with per-split document and
    * TOKEN budgets — the numbers a training run actually consumes
    * ("how many tokens of train data survive cleaning?"). One oracle row
    * set pins the full composition: every upstream stage's bug surfaces
    * here too.
    */
  def splitBudgets(s: SparkSession, d: String): DataFrame = {
    val cleaned = cleanCorpus(s, d) // (doc_id, n_tokens)
    val clusters = Dedup.duplicateClusters(s, d)
    cleaned
      .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("cluster_id"), col("doc_id")).as("canon"))
      .withColumn("h", expr(
        "pmod(CAST(conv(substr(md5(concat(CAST(canon AS STRING), 'split')), 1, 13), 16, 10) AS BIGINT), 100)"))
      .withColumn("split",
        when(col("h") < 90, "train").when(col("h") < 95, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"))
  }

  /** THE REFINERY WRITE: the cleaned corpus ([[cleanCorpus]]'s survivors —
    * quality gate → exact dedup → near-dup canonical filter) routed
    * through the packed-export plan ([[TextOps.packedFoldOf]]) — shard
    * count derived from the CLEANED token mass, survivors shuffled
    * deterministically and packed into budget bins. This is the last
    * stage of the pipeline this engine exists for: every upstream
    * operator's bug (a wrong quality score, a missed duplicate, a split
    * shard) surfaces in this one manifest, and the oracle replays the
    * whole composition end-to-end.
    */
  /** Cleaned (doc_id, text) survivors + their derived shard count —
    * shared by the manifest face and the writer.
    */
  private def cleanedDocsAndShards(s: SparkSession, d: String): (DataFrame, Int) = {
    val cleaned = cleanCorpus(s, d).localCheckpoint() // (doc_id, n_tokens), used twice
    val t = cleaned.agg(coalesce(sum(col("n_tokens").cast("long")), lit(0L)))
      .head().getLong(0)
    val nShards = math.max(1L,
      (t + TextOps.shardTokenBudget - 1) / TextOps.shardTokenBudget).toInt
    val docs = Tables.documents(s, d)
      .join(cleaned.select("doc_id"), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"))
    (docs, nShards)
  }

  /** The materialization of [[cleanExportManifest]]: cleaned survivors
    * written as one packed parquet file per shard.
    */
  def writeCleanPackedShards(s: SparkSession, d: String, out: String): Unit = {
    val (docs, nShards) = cleanedDocsAndShards(s, d)
    TextOps.writePackedShardsOf(s, docs, nShards, out)
  }

  def cleanExportManifest(s: SparkSession, d: String): DataFrame = {
    val (docs, nShards) = cleanedDocsAndShards(s, d)
    TextOps.packedFoldOf(s, docs, nShards)
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("bin_tokens"),
        min("pos").as("first_pos"), max("pos").as("last_pos"))
      .withColumn("n_shards", lit(nShards))
  }

  lazy val cleanExportSql: String = TextOps.packedManifestSqlOver(
    s"""SELECT d.doc_id, d.text
       |FROM documents d JOIN (${cleanCorpusSql.replace("\n", "\n  ")}) c
       |  ON d.doc_id = c.doc_id""".stripMargin)

  // lazy: composes cleanCorpusSql, declared below (val init order)
  lazy val splitBudgetsSql: String =
    s"""WITH cleaned AS (${cleanCorpusSql.replace("\n", "\n  ")}),
       | cl AS (${Dedup.duplicateClustersSql.replace("\n", "\n  ")}),
       | canon AS (
       |  SELECT c.doc_id, c.n_tokens, coalesce(cl.cluster_id, c.doc_id) AS canon
       |  FROM cleaned c LEFT JOIN cl ON cl.id = c.doc_id),
       | tagged AS (
       |  SELECT doc_id, n_tokens, canon,
       |   (('0x' || substr(md5(CAST(canon AS VARCHAR) || 'split'), 1, 13))::BIGINT) % 100 AS h
       |  FROM canon)
       |SELECT CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split,
       | COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |FROM tagged GROUP BY 1""".stripMargin

  val leakageSafeSplitsSql: String =
    s"""WITH clusters AS (${Dedup.duplicateClustersSql.replace("\n", "\n  ")}),
       | canon AS (
       |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS canon
       |  FROM documents d LEFT JOIN clusters c ON c.id = d.doc_id),
       | tagged AS (
       |  SELECT doc_id, canon,
       |   (('0x' || substr(md5(CAST(canon AS VARCHAR) || 'split'), 1, 13))::BIGINT) % 100 AS h
       |  FROM canon)
       |SELECT CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split,
       | COUNT(*) AS n_docs, CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_clusters
       |FROM tagged GROUP BY 1""".stripMargin

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
