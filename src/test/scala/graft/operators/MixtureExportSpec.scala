package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The mixture-weighted packed export ([[TextOps.mixtureExportManifest]]):
  * the sampled corpus must be exactly the mixture plan's integer-permille
  * hash sample, the shard count must derive from the SAMPLED token mass,
  * and the bins must obey the packing invariants.
  */
class MixtureExportSpec extends SparkSpec {

  test("manifest: derived shard count, budget bins, docs = the exact mixture sample") {
    val d = sf()
    val docs = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"),
        size(split(col("text"), " ")).as("n_tokens")).collect()
    // driver-side replica of the plan: per-source integer-permille rates
    val bySource = docs.groupBy(_.getString(1))
    val totalChars = docs.map(_.getString(2).length.toLong).sum
    // n_chars in the table equals text length? derive rates from the plan itself instead
    val plan = TextOps.mixturePlan(spark, d)
      .select(col("source"), col("budget_chars"), col("avail_chars"))
      .collect().map(r => r.getString(0) -> math.min(1000L, 1000L * r.getLong(1) / r.getLong(2)))
      .toMap
    def inSample(r: org.apache.spark.sql.Row): Boolean = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(2).getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.substring(0, 13), 16) % 1000 < plan(r.getString(1))
    }
    val sampled = docs.filter(inSample)
    assert(sampled.nonEmpty && sampled.length < docs.length,
      "fixture sample is degenerate — face untested")
    val sampledTokens = sampled.map(_.getInt(3).toLong).sum
    val wantShards = math.max(1L,
      (sampledTokens + TextOps.shardTokenBudget - 1) / TextOps.shardTokenBudget)

    val m = TextOps.mixtureExportManifest(spark, d).collect()
    assert(m.nonEmpty)
    assert(m.forall(_.getInt(6).toLong == wantShards),
      s"n_shards must derive from the SAMPLED token mass ($wantShards)")
    assert(m.map(_.getLong(2)).sum == sampled.length.toLong,
      "manifest docs != the exact mixture sample")
    assert(m.map(_.getLong(3)).sum == sampledTokens,
      "manifest token mass != the sampled mass")
    m.foreach { r =>
      assert(r.getLong(3) <= TextOps.packBudget || r.getLong(2) == 1L,
        s"overfilled bin: $r")
    }
    assert(totalChars > 0 && bySource.nonEmpty) // fixture sanity
  }

  test("plan shape: rates broadcast, no global sort, per-shard sort only") {
    val plan = TextOps.mixtureExportManifest(spark, sf())
      .queryExecution.executedPlan.toString
    val globalSorts = "(?m)^\\s*\\*?\\(?\\d*\\)?\\s*Sort .*global=true".r
      .findAllIn(plan).length
    assert(globalSorts == 0, s"global sort in the export plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no sort-merge join belongs in the export plan:\n$plan")
    // the sample subplan (checkpointed away in the manifest's plan)
    val sample = TextOps.mixtureSampledDocs(spark, sf())
      .queryExecution.executedPlan.toString
    assert(sample.contains("BroadcastHashJoin") && !sample.contains("SortMergeJoin"),
      s"the per-source rates must broadcast:\n$sample")
  }
}
