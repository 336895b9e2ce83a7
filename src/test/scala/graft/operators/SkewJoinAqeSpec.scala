package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join evidence: beyond the manual salting operators
  * (`Skew.saltedAgg`/`saltedJoin`, oracle-checked), the engine relies on
  * AQE to split runtime-detected skewed partitions in sort-merge joins —
  * the no-code-change path for skew that only shows up in production data.
  * This spec forces a 1000:1 skewed key through an SMJ with thresholds
  * scaled to the test data and asserts the executed plan actually split
  * the skewed partition (`skew=true`), with the result unchanged.
  */
class SkewJoinAqeSpec extends SparkSpec {

  test("AQE splits a runtime-detected skewed SMJ partition") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      // keep the join an SMJ: no broadcast
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 0 carries 100k rows with a fat payload; keys 1..50 carry 200 each
      val left = spark.range(100000).select(lit(0L).as("k"),
          concat(lit("x" * 64), col("id").cast("string")).as("payload"))
        .unionAll(spark.range(10000).select((col("id") % 50 + 1).as("k"),
          col("id").cast("string").as("payload")))
      val right = spark.range(51).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = left.join(right, "k")
      // execute THIS query execution (count() would build a different one
      // whose AdaptiveSparkPlan is the one that finalizes)
      assert(joined.collect().length == 110000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed SMJ partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
