package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the log-native temporal operator SURVEY.md §2.5 lists as the
  * one join Spark lacks a built-in for. Implemented as the scalable
  * composition (SURVEY.md §7.3): tag both sides, UNION ALL, one window pass
  * per key carrying the last right-side value at-or-before each left row.
  *
  * Scale shape: exactly ONE shuffle (on the join key) and a per-partition
  * sort — same cost as a sort-merge join, no point-in-time subquery per row,
  * no nested loop, no state blowup. This is how production log engines
  * execute as-of at scale; a custom SparkStrategy could fuse the tag/union
  * away but wouldn't change the shuffle count.
  */
object AsofJoin {

  /** Generic as-of: for each `left` row, the latest `right` row with the
    * same `key` and `rightTime` <= `leftTime` (inclusive). Returns all left
    * columns plus `payload` columns from the right (null when no match).
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]
  ): DataFrame = {
    val SIDE = "_asof_side"
    val T = "_asof_t"
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn(SIDE, lit(1))
      .withColumn(T, col(leftTime))
      .select(Seq(col(key).as("_asof_key"), col(SIDE), col(T)) ++
        leftCols.filterNot(_ == key).map(c => col(c)) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"_p_$p")): _*)
    val r = right
      .withColumn(SIDE, lit(0))
      .withColumn(T, col(rightTime))
      .select(Seq(col(key).as("_asof_key"), col(SIDE), col(T)) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"_p_$p")): _*)
    // Right rows at an equal timestamp sort before left rows (side 0 < 1),
    // making the join inclusive — matches ASOF JOIN ... ON t >= t' semantics.
    val w = Window.partitionBy("_asof_key").orderBy(col(T), col(SIDE))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(s"_v_$p", last(col(s"_p_$p"), ignoreNulls = true).over(w))
    }
    carried
      .where(col(SIDE) === 1)
      .select(Seq(col("_asof_key").as(key)) ++
        leftCols.filterNot(_ == key).map(c => col(c)) ++
        payload.map(p => col(s"_v_$p").as(p)): _*)
  }

  /** For each click event: the same user's most recent purchase at or before
    * the click (classic "state of X as of event time" log query).
    */
  def lastPurchaseBeforeClick(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("p_ts_us"), col("value").as("p_value"))
    asof(clicks, purchases, key = "user_id", leftTime = "ts_us", rightTime = "p_ts_us",
      payload = Seq("p_ts_us", "p_value"))
      .select(col("event_id"), col("user_id"), col("p_ts_us"), col("p_value"))
  }

  val lastPurchaseBeforeClickSql: String =
    """SELECT c.event_id, c.user_id, p.p_ts_us, p.p_value
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      |      WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT user_id, epoch_us(ts) AS p_ts_us, value AS p_value
      |                FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND c.ts_us >= p.p_ts_us""".stripMargin

  /** Forward as-of: for each `left` row, the EARLIEST `right` row with the
    * same `key` and `rightTime` >= `leftTime` (inclusive) — the mirror of
    * [[asof]] ("next state change after this event"). Same single-shuffle
    * shape: the window runs current-row-to-following and carries the first
    * right-side value; right rows at an equal timestamp sort after left
    * rows so the match is inclusive.
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]
  ): DataFrame = {
    val SIDE = "_asof_side"
    val T = "_asof_t"
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn(SIDE, lit(0))
      .withColumn(T, col(leftTime))
      .select(Seq(col(key).as("_asof_key"), col(SIDE), col(T)) ++
        leftCols.filterNot(_ == key).map(c => col(c)) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"_p_$p")): _*)
    val r = right
      .withColumn(SIDE, lit(1))
      .withColumn(T, col(rightTime))
      .select(Seq(col(key).as("_asof_key"), col(SIDE), col(T)) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"_p_$p")): _*)
    val w = Window.partitionBy("_asof_key").orderBy(col(T), col(SIDE))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(s"_v_$p", first(col(s"_p_$p"), ignoreNulls = true).over(w))
    }
    carried
      .where(col(SIDE) === 0)
      .select(Seq(col("_asof_key").as(key)) ++
        leftCols.filterNot(_ == key).map(c => col(c)) ++
        payload.map(p => col(s"_v_$p").as(p)): _*)
  }

  /** For each click event: the same user's next error at or after the click
    * (forward as-of — "what broke after this?").
    */
  def nextErrorAfterClick(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts_us").as("e_ts_us"), col("value").as("e_value"))
    asofForward(clicks, errors, key = "user_id", leftTime = "ts_us", rightTime = "e_ts_us",
      payload = Seq("e_ts_us", "e_value"))
      .select(col("event_id"), col("user_id"), col("e_ts_us"), col("e_value"))
  }

  val nextErrorAfterClickSql: String =
    """SELECT c.event_id, c.user_id, t.e_ts_us, t.e_value
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      |      WHERE event_type = 'click') c
      |LEFT JOIN LATERAL (
      |  SELECT e_ts_us, e_value
      |  FROM (SELECT user_id, epoch_us(ts) AS e_ts_us, value AS e_value
      |        FROM events WHERE event_type = 'error') e
      |  WHERE e.user_id = c.user_id AND e.e_ts_us >= c.ts_us
      |  ORDER BY e.e_ts_us LIMIT 1) t ON true""".stripMargin

  /** Range join: errors within 10 minutes after each click, same user — executed as
    * an equi join on user_id with the time range as a join-level predicate
    * (no nested loop; at 100 TB both sides shuffle once on user_id, and a
    * coarse time-bucket key could be added to the equi side to cut skew).
    */
  def errorsNearClicks(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_us").as("c_ts"))
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts_us").as("e_ts"))
    clicks.join(errors,
        col("user_id") === col("e_user") &&
          col("e_ts") > col("c_ts") && col("e_ts") <= col("c_ts") + lit(600000000L))
      .groupBy("click_id", "user_id")
      .agg(count(lit(1)).as("n_errors"), min("e_ts").as("first_error_ts"))
  }

  val errorsNearClicksSql: String =
    """SELECT c.click_id, c.user_id, COUNT(*) AS n_errors, MIN(e.e_ts) AS first_error_ts
      |FROM (SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_ts FROM events
      |      WHERE event_type = 'click') c
      |JOIN (SELECT user_id AS e_user, epoch_us(ts) AS e_ts FROM events
      |      WHERE event_type = 'error') e
      |  ON c.user_id = e.e_user AND e.e_ts > c.c_ts AND e.e_ts <= c.c_ts + 600000000
      |GROUP BY c.click_id, c.user_id""".stripMargin
}
