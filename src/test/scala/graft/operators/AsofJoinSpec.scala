package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics on hand-built frames: inclusive at-or-before match,
  * null when no prior right row, latest-wins among candidates.
  */
class AsofJoinSpec extends SparkSpec {

  test("asof picks the latest right row at or before each left time") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 150L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 50L, 10.0), (1L, 100L, 20.0), (1L, 180L, 30.0), (2L, 160L, 40.0))
      .toDF("k", "rt", "v")
    val out = AsofJoin.asof(left, right, "k", "t", "rt", Seq("rt", "v"))
      .orderBy("k", "t").collect()

    // (1,100): right at exactly 100 wins (inclusive) over 50
    assert(out(0).getAs[Double]("v") == 20.0 && out(0).getAs[Long]("rt") == 100L)
    // (1,200): latest prior is 180
    assert(out(1).getAs[Double]("v") == 30.0)
    // (2,150): right row is at 160 (after) → null
    assert(out(2).isNullAt(out(2).fieldIndex("v")))
  }

  test("asofForward picks the earliest right row at or after each left time") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 150L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 120L, 20.0), (1L, 190L, 30.0), (2L, 140L, 40.0))
      .toDF("k", "rt", "v")
    val out = AsofJoin.asofForward(left, right, "k", "t", "rt", Seq("rt", "v"))
      .orderBy("k", "t").collect()

    // (1,100): right at exactly 100 matches (inclusive), not 120
    assert(out(0).getAs[Double]("v") == 10.0 && out(0).getAs[Long]("rt") == 100L)
    // (1,200): no right row at or after 200 → null
    assert(out(1).isNullAt(out(1).fieldIndex("v")))
    // (2,150): right row at 140 is before → null
    assert(out(2).isNullAt(out(2).fieldIndex("v")))
  }

  test("asof query on events: purchase always at or before the click") {
    val out = AsofJoin.lastPurchaseBeforeClick(spark, sf())
    val bad = out.where(col("p_ts_us").isNotNull)
      .join(graft.core.Tables.events(spark, sf())
        .where(col("event_type") === "click")
        .select(col("event_id"), col("ts_us").as("c_ts")), "event_id")
      .where(col("p_ts_us") > col("c_ts"))
      .count()
    assert(bad == 0)
    assert(out.count() > 0)
  }

  test("range join counts only errors within the 10-minute window") {
    val out = AsofJoin.errorsNearClicks(spark, sf())
    assert(out.where(col("n_errors") <= 0).count() == 0)
    // verify one row by hand
    val ev = graft.core.Tables.events(spark, sf())
    val sample = out.orderBy("click_id").head()
    val clickTs = ev.where(col("event_id") === sample.getAs[Long]("click_id"))
      .head().getAs[Long]("ts_us")
    val manual = ev.where(col("event_type") === "error" &&
        col("user_id") === sample.getAs[Long]("user_id") &&
        col("ts_us") > clickTs && col("ts_us") <= clickTs + 600000000L)
      .count()
    assert(manual == sample.getAs[Long]("n_errors"))
  }
}
