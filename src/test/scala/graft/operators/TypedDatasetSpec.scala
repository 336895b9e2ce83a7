package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Typed Dataset surface (SURVEY.md §1.5: `Dataset[T]` with case-class
  * encoders where type safety helps): groupByKey + typed reduce/Aggregator
  * agree exactly with the untyped DataFrame aggregation.
  */
class TypedDatasetSpec extends SparkSpec {

  test("groupByKey + reduceGroups ≡ untyped groupBy sum (exact cents)") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf())
    val typed = li
      .select(col("l_returnflag"), (col("l_quantity") * 100).cast("long").as("cents"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .reduceGroups(_ + _)
      .collect().toMap
    val untyped = li.groupBy("l_returnflag")
      .agg(sum((col("l_quantity") * 100).cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typed == untyped)
  }

  test("typed Aggregator via toColumn on a typed Dataset") {
    import spark.implicits._
    val qty = Tables.lineitem(spark, sf())
      .select(col("l_quantity")).as[java.lang.Double](org.apache.spark.sql.Encoders.DOUBLE)
    val stats = qty.select(graft.functions.QuantityStats.toColumn).head()
    assert(stats.n == Tables.lineitem(spark, sf()).count())
    assert(stats.mean > 0 && stats.varPop > 0)
  }
}
