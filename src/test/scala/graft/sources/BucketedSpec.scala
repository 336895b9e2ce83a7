package graft.sources

import graft.SparkSpec
import graft.core.Tables

/** Bucketing removes the join shuffle: both sides written bucketed+sorted
  * on the key → the physical plan contains no shuffle Exchange (broadcast
  * disabled to force the general join path).
  */
class BucketedSpec extends SparkSpec {

  test("equi join of co-bucketed tables plans without a shuffle exchange") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Bucketed.write(Tables.orders(spark, sf()).withColumnRenamed("o_custkey", "custkey"),
        "b_orders", "custkey", 8)
      Bucketed.write(Tables.customer(spark, sf()).withColumnRenamed("c_custkey", "custkey"),
        "b_customer", "custkey", 8)

      val joined = Bucketed.coLocatedJoin(spark, "b_orders", "b_customer", "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free co-located join:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")

      // and the result is still correct
      val n = joined.count()
      val o = Tables.orders(spark, sf())
      val c = Tables.customer(spark, sf())
      val expected = o.join(c, o("o_custkey") === c("c_custkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("non-bucketed join of the same inputs DOES shuffle (control)") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val o = Tables.orders(spark, sf())
      val c = Tables.customer(spark, sf())
      val plan = o.join(c, o("o_custkey") === c("c_custkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("Exchange hashpartitioning"), s"control should shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("declared bucketed query: join below the aggregate is exchange-free") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = graft.operators.Relational.bucketedRevenueByPriority(spark, sf())
      val plan = df.queryExecution.executedPlan
      // the only exchange allowed is the final groupBy's — none under the join
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(joins.nonEmpty, s"expected SMJ:\n$plan")
      joins.foreach { j =>
        val under = j.toString
        assert(!under.contains("Exchange hashpartitioning"),
          s"join should zip pre-sorted buckets, not shuffle:\n$under")
      }
      assert(df.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
