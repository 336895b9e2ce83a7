package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curriculum-export invariants beyond the oracle's value replay:
  *   - the schedule is a CURRICULUM: within every shard, bins walk
  *     quality buckets non-decreasing (bin b's ckey_hi ≤ bin b+1's
  *     ckey_lo never needs to hold — buckets may straddle bins — but the
  *     POSITION order must: first_pos ranges are contiguous and ckey_lo
  *     is non-decreasing across bins);
  *   - completeness: every doc lands once, token mass preserved;
  *   - budget: every bin ≤ packBudget unless single-doc.
  */
class CurriculumExportSpec extends SparkSpec {
  import spark.implicits._

  private lazy val m = TextOps.curriculumExportManifest(spark, sf()).cache()
  private lazy val docs = graft.core.Tables.documents(spark, sf())
    .select(col("doc_id"), size(TextOps.tokens("text")).as("n_tokens")).cache()

  test("bins are contiguous pos runs walking non-decreasing quality buckets") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("bin")
    val seq = m
      .withColumn("prev_last_pos", lag(col("last_pos"), 1).over(w))
      .withColumn("prev_ckey_hi", lag(col("ckey_hi"), 1).over(w))
      .where(col("prev_last_pos").isNotNull)
    assert(seq.where(col("first_pos") =!= col("prev_last_pos") + 1).count() == 0,
      "bins must cover contiguous pos runs")
    assert(seq.where(col("ckey_lo") < col("prev_ckey_hi")).count() == 0,
      "pos order must walk quality buckets ascending (curriculum)")
  }

  test("every doc lands once and token mass is preserved") {
    assert(m.agg(sum("n_docs")).as[Long].head() == docs.count())
    assert(m.agg(sum("bin_tokens")).as[Long].head() ==
      docs.agg(sum(col("n_tokens").cast("long"))).as[Long].head())
  }

  test("bins respect the budget unless single-doc") {
    assert(m.where(col("bin_tokens") > TextOps.packBudget && col("n_docs") =!= 1)
      .count() == 0)
  }

  test("the written shards read back in curriculum order, matching the manifest") {
    val out = tmpDir("curriculum-shards")
    TextOps.writeCurriculumShards(spark, sf(), out)
    val back = spark.read.parquet(out).cache()
    // membership: every doc exactly once
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    // one parquet file per shard
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
    try {
      import scala.jdk.CollectionConverters._
      val perShard = files.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(_.getParent.getFileName.toString).toSeq
        .groupBy(identity).map(_._2.size)
      assert(perShard.nonEmpty && perShard.forall(_ == 1))
    } finally files.close()
    // bin grain matches the manifest's (n_docs, bin_tokens) per (shard, bin)
    val backBins = back
      .join(docs, Seq("doc_id"))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("b_docs"), sum(col("n_tokens").cast("long")).as("b_tokens"))
    val mismatch = backBins.join(m, Seq("shard", "bin"))
      .where(col("b_docs") =!= col("n_docs") || col("b_tokens") =!= col("bin_tokens"))
    assert(mismatch.count() == 0, "written bins must match the declared manifest")
    // curriculum order: within a shard, ckey never decreases across bins
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("bin")
    val binned = back.groupBy("shard", "bin")
      .agg(min("ckey").as("lo"), max("ckey").as("hi"))
      .withColumn("prev_hi", lag(col("hi"), 1).over(w))
      .where(col("prev_hi").isNotNull)
    assert(binned.where(col("lo") < col("prev_hi")).count() == 0)
  }
}
