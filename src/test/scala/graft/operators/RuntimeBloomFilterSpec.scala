package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: for a shuffle join where one side is
  * selectively filtered, the optimizer injects a bloom filter built from
  * the filtered side's join keys and applies it to the big side BEFORE the
  * shuffle — at 100 TB this is the difference between shuffling the whole
  * fact table and shuffling only rows that can possibly match.
  */
class RuntimeBloomFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter on the fact side") {
    import spark.implicits._
    val factDir = tmpDir("bloom") + "/fact"
    val dimDir = tmpDir("bloom") + "/dim"
    spark.range(200000).select(col("id").as("k"),
      concat(lit("p"), col("id").cast("string")).as("payload"))
      .write.parquet(factDir)
    spark.range(5000).select(col("id").as("dk"),
      (col("id") % 7).as("cat")).write.parquet(dimDir)

    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(factDir)
      val dim = spark.read.parquet(dimDir).where(col("cat") === 3)
      val joined = fact.join(dim, fact("k") === dim("dk"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected runtime bloom filter:\n$plan")
      // and the filter must not change the result
      assert(joined.count() == (0 until 5000).count(_ % 7 == 3).toLong)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
