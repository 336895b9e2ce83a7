package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning evidence: a join whose key is the fact
  * table's hive-partition column must prune fact partitions at RUNTIME
  * from the dim side's selective filter — the mechanism that makes
  * star-joins over a date-partitioned 100 TB fact table read one
  * partition's files instead of all of them. Asserted two ways: the
  * partition filter in the plan is a `dynamicpruning` subquery, and the
  * post-execution scan metric shows only the matching partition's files
  * were read.
  */
class DynamicPruningSpec extends SparkSpec {

  test("partition-key join prunes fact partitions at runtime") {
    import spark.implicits._
    val dir = tmpDir("dpp") + "/fact"
    (0 until 8).flatMap(y => (0 until 500).map(i => (1990 + y, y * 1000L + i)))
      .toDF("year", "v")
      .repartition(2)
      .write.partitionBy("year").parquet(dir)

    // AQE off so the executed plan exposes FileSourceScanExec metrics
    // directly (inputFiles is pre-pruning and useless as evidence)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val f = spark.read.parquet(dir)
      // dim must be a real source with a non-foldable selective filter —
      // a LocalRelation's filter constant-folds away and DPP sees no
      // selective predicate to prune with
      val dimDir = tmpDir("dpp-dim") + "/dim"
      (1990 until 1998).map(y => (y, if (y == 1993) "keep" else "drop"))
        .toDF("dyear", "tag").write.parquet(dimDir)
      val dim = spark.read.parquet(dimDir).where(col("tag") === "keep")
      val joined = f.join(broadcast(dim), f("year") === dim("dyear"))
      assert(joined.count() == 500L)

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"expected a dynamicpruning partition filter:\n$plan")

      val scan = joined.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.output.exists(_.name == "v") => s
      }.head
      val readFiles = scan.metrics("numFiles").value
      val allFiles = spark.read.parquet(dir).inputFiles.length
      assert(readFiles < allFiles, s"no pruning: read $readFiles of $allFiles")
      assert(readFiles <= allFiles / 4, s"pruning too weak: $readFiles of $allFiles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
