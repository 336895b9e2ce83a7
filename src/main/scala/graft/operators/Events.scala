package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time operators over the `events` table — batch forms of the
  * Structured Streaming pipeline in `graft.streaming` (identical
  * window/session semantics, so the streaming path is oracle-checked
  * through these).
  *
  * Timestamp discipline: the source column is parquet TIMESTAMP(NANOS);
  * Spark works at µs (`Tables.events` exposes exact `ts_us`), DuckDB at ns.
  * Every output expresses time as epoch seconds/micros BIGINT so the two
  * engines hash identically.
  */
object Events {

  /** Batch twin of the streaming leaderboard
    * ([[graft.streaming.TopK.topKPerType]]): top-5 events per type by
    * (value desc, event_id) — the state the bounded streaming operator
    * converges to, which StreamingTopKSpec proves; this declared form
    * oracle-checks the ranking semantics.
    */
  def streamingTopk(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("rank", row_number().over(
        Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id"))))
      .where(col("rank") <= 5)
      .select(col("event_type"), col("rank"), col("event_id"), col("value"))

  val streamingTopkSql: String =
    """SELECT event_type, CAST(rn AS INTEGER) AS rank, event_id, value FROM (
      | SELECT event_type, event_id, value,
      |   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
      | FROM events)
      |WHERE rn <= 5""".stripMargin

  /** Tumbling 1-hour windows per event type (streaming: groupBy(window(...))). */
  def hourlyByType(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))

  val hourlyByTypeSql: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
      | COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Sliding windows: 1-hour length, 30-minute slide — every event lands in
    * exactly two windows (Spark `window(ts, '1 hour', '30 minutes')`,
    * epoch-aligned starts).
    */
  def slidingCounts(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("wstart"), col("event_type"), col("n"))

  val slidingCountsSql: String =
    """SELECT wstart, event_type, COUNT(*) AS n FROM (
      | SELECT event_type,
      |   unnest([(epoch_us(ts) // 1800000000) * 1800,
      |           (epoch_us(ts) // 1800000000) * 1800 - 1800]) AS wstart
      | FROM events)
      |GROUP BY 1, 2""".stripMargin

  /** Session windows per user with a 10-minute inactivity gap — Spark
    * `session_window`; the oracle derives identical sessions by
    * gaps-and-islands (lag + cumulative break count).
    */
  def userSessions(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(unix_micros(col("session_window.start")).as("session_start_us"),
        col("user_id"), col("n"), col("total"))

  val userSessionsSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
      | m AS (SELECT *, CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) >= 600000000
      |                      THEN 1 ELSE 0 END AS brk FROM e),
      | g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us
      |                                ROWS UNBOUNDED PRECEDING) AS sid FROM m)
      |SELECT MIN(us) AS session_start_us, user_id, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM g GROUP BY user_id, sid""".stripMargin

  /** Semi-structured extraction: JSON props → typed column, aggregated. */
  def jsonPropsSummary(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("k_sum"), max(col("k")).as("k_max"), count(lit(1)).as("n"))

  // NOTE: the final SUM is wrapped in CAST(... AS BIGINT): DuckDB's
  // SUM(BIGINT) yields HUGEINT, which the driver's pandas bridge renders as
  // float64 and hash-drifts against Spark's int64 (CORRECTNESS_r01 red row).
  val jsonPropsSummarySql: String =
    """SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
      | MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max, COUNT(*) AS n
      |FROM events GROUP BY event_type""".stripMargin

  /** Funnel analysis: per user, did a `signup` → `click` → `purchase`
    * sequence occur in event-time order? Computed with ordered min-times
    * per stage (one shuffle on user), the set-based funnel formulation that
    * scales — no per-user row iteration, no UDAF state.
    */
  def signupClickPurchaseFunnel(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(when(col("event_type") === "signup", col("ts_us"))).as("t_signup"),
        min(when(col("event_type") === "click", col("ts_us"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts_us"))).as("t_purchase"))
      .select(col("user_id"), col("n_events"),
        (col("t_signup").isNotNull && col("t_click").isNotNull &&
          col("t_purchase").isNotNull &&
          col("t_signup") < col("t_click") && col("t_click") < col("t_purchase"))
          .as("completed_funnel"))

  val signupClickPurchaseFunnelSql: String =
    """SELECT user_id, COUNT(*) AS n_events,
      | (MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) IS NOT NULL
      |  AND MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) IS NOT NULL
      |  AND MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) IS NOT NULL
      |  AND MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
      |    < MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
      |  AND MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
      |    < MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)) AS completed_funnel
      |FROM events GROUP BY user_id""".stripMargin

  /** Cohort retention: users grouped by their first-activity day; for each
    * (cohort_day, activity_day) the count of distinct returning users — the
    * standard growth-analytics matrix, two shuffles (first-day per user,
    * then the cohort×day rollup).
    */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val firstDay = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    ev.join(firstDay, "user_id")
      .groupBy("cohort_day", "day")
      .agg(countDistinct(col("user_id")).as("active_users"))
      .select(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("active_users"))
  }

  val cohortRetentionSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      | f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id)
      |SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
      |       strftime(e.day, '%Y-%m-%d') AS day,
      |       COUNT(DISTINCT e.user_id) AS active_users
      |FROM e JOIN f USING (user_id)
      |GROUP BY f.cohort_day, e.day""".stripMargin

  /** Per-user ordered delta: time between consecutive events (lag over
    * event-time, exact µs arithmetic).
    */
  def interEventGaps(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .where(col("prev_us").isNotNull)
      .select(col("event_id"), col("user_id"), (col("ts_us") - col("prev_us")).as("gap_us"))
  }

  val interEventGapsSql: String =
    """SELECT event_id, user_id, gap_us FROM (
      | SELECT event_id, user_id,
      |  epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
      | FROM events)
      |WHERE gap_us IS NOT NULL""".stripMargin

  /** Event-transition (Markov) counts: per user, consecutive event-type
    * pairs via `lead` over the exact-µs total order, then one count
    * shuffle — the sequence-mining statistic behind funnel discovery and
    * bot detection. Window partitions per user; no task sees more than one
    * user's history.
    */
  def transitionCounts(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  val transitionCountsSql: String =
    """SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      |FROM (
      | SELECT event_type,
      |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
      | FROM events)
      |WHERE next_type IS NOT NULL
      |GROUP BY 1, 2""".stripMargin

  /** Hourly anomaly detection: z-score of each (type, hour) count against
    * the type's own hourly distribution. Moments are exact BIGINT sums
    * (counts and squared counts), so mean/variance reduce to two fixed-order
    * double divisions both engines reproduce bit-for-bit — the monitoring
    * primitive over event streams, two aggregations and a broadcastable
    * per-type stats join.
    */
  def hourlyAnomalies(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"), unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("n")).as("s"), sum(col("n") * col("n")).as("ss"))
    val mean = col("s").cast("double") / col("cnt").cast("double")
    val varr = col("ss").cast("double") / col("cnt").cast("double") - mean * mean
    hourly.join(broadcast(stats), "event_type")
      .withColumn("z", (col("n").cast("double") - mean) / sqrt(varr))
      .where(abs(col("z")) > 1.5)
      .select("event_type", "hour_epoch", "n", "z")
  }

  val hourlyAnomaliesSql: String =
    """WITH hourly AS (
      |  SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      | stats AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
      |    CAST(SUM(n) AS BIGINT) AS s, CAST(SUM(n * n) AS BIGINT) AS ss
      |  FROM hourly GROUP BY 1)
      |SELECT h.event_type, h.hour_epoch, h.n,
      |  (CAST(h.n AS DOUBLE) - CAST(t.s AS DOUBLE) / CAST(t.cnt AS DOUBLE))
      |   / sqrt(CAST(t.ss AS DOUBLE) / CAST(t.cnt AS DOUBLE)
      |          - (CAST(t.s AS DOUBLE) / CAST(t.cnt AS DOUBLE))
      |            * (CAST(t.s AS DOUBLE) / CAST(t.cnt AS DOUBLE))) AS z
      |FROM hourly h JOIN stats t ON h.event_type = t.event_type
      |WHERE abs((CAST(h.n AS DOUBLE) - CAST(t.s AS DOUBLE) / CAST(t.cnt AS DOUBLE))
      |   / sqrt(CAST(t.ss AS DOUBLE) / CAST(t.cnt AS DOUBLE)
      |          - (CAST(t.s AS DOUBLE) / CAST(t.cnt AS DOUBLE))
      |            * (CAST(t.s AS DOUBLE) / CAST(t.cnt AS DOUBLE)))) > 1.5""".stripMargin

  /** Time-series gap-fill + forward-fill: a dense hourly spine per event
    * type (explode of `sequence` over the global bounds — generated, never
    * scanned), left-joined with observed hourly aggregates; missing hours
    * get n=0 and carry the last observed max forward (`last` IGNORE NULLS
    * over a running frame). The spine is |types| × |hours| rows — tiny next
    * to the data at any scale — and the ffill window partitions per type,
    * so no task ever sees more than one type's spine.
    */
  def hourlyGapfill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("h"), col("value"))
    val hourly = ev.groupBy("event_type", "h")
      .agg(count(lit(1)).as("n"), max(col("value")).as("mx"))
    val bounds = ev.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
    val spine = ev.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), lit(3600L))).as("h"))
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h").as("hour_epoch"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("mx"), ignoreNulls = true).over(w).as("mx_ffill"))
  }

  val hourlyGapfillSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h, value FROM events),
      | hourly AS (SELECT event_type, h, COUNT(*) AS n, MAX(value) AS mx FROM ev GROUP BY 1, 2),
      | bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
      | spine AS (
      |  SELECT t.event_type, u.h
      |  FROM (SELECT DISTINCT event_type FROM ev) t
      |  CROSS JOIN (SELECT unnest(generate_series(lo, hi, 3600)) AS h FROM bounds) u)
      |SELECT s.event_type, s.h AS hour_epoch, coalesce(hh.n, 0) AS n,
      | last_value(hh.mx IGNORE NULLS) OVER (PARTITION BY s.event_type ORDER BY s.h
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx_ffill
      |FROM spine s LEFT JOIN hourly hh ON s.event_type = hh.event_type AND s.h = hh.h""".stripMargin

  /** Exponentially-weighted moving average over each type's hourly count
    * series (α = 0.2) — the smoothing step behind rate-anomaly monitors.
    * The recursion s_t = α·x_t + (1−α)·s_{t−1} is inherently ordered, so
    * both engines compute it as a left fold over the hour-sorted list
    * seeded with the first element (Spark `aggregate(slice(arr,2,…),
    * arr[1], …)` ≡ DuckDB `list_reduce`, which seeds from the head) —
    * bit-identical, no float-order ambiguity. One shuffle (the hourly
    * pre-aggregation carries map-side partials); per-type state is one
    * bounded array.
    */
  def hourlyEwma(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(collect_list(struct(col("h"), col("n"))).as("hs"))
      .select(col("event_type"),
        size(col("hs")).as("n_hours"),
        expr("""aggregate(slice(transform(array_sort(hs), p -> CAST(p.n AS DOUBLE)), 2, size(hs)),
               | element_at(transform(array_sort(hs), p -> CAST(p.n AS DOUBLE)), 1),
               | (acc, x) -> CAST(0.2 AS DOUBLE) * x + CAST(0.8 AS DOUBLE) * acc)""".stripMargin)
          .as("ewma"))

  val hourlyEwmaSql: String =
    """WITH hourly AS (
      |  SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, COUNT(*) AS n_hours,
      | list_reduce(list_transform(list(n ORDER BY h), v -> CAST(v AS DOUBLE)),
      |   (acc, x) -> CAST(0.2 AS DOUBLE) * x + CAST(0.8 AS DOUBLE) * acc) AS ewma
      |FROM hourly GROUP BY event_type""".stripMargin

  /** Exact heavy hitters (users with > 1/k of all events) via the two-pass
    * Misra–Gries shape: a per-partition bounded summary (`hhCounters` ≥ k
    * counters, so no global heavy hitter can be missed — pigeonhole: an
    * item with global share > 1/k has share > 1/k in at least one
    * partition, and MG with s ≥ k counters retains every such item) emits
    * a small candidate superset, then only candidates are exactly
    * recounted. The exact recount makes the result identical to a full
    * GROUP BY — which is exactly what the oracle runs — but the shuffle
    * carries only candidate rows and each summary is O(s) memory
    * regardless of partition size: at 100 TB this is a map-only pass plus
    * a candidate-bounded aggregation, where the naive form shuffles every
    * distinct key.
    */
  val hhK = 200
  val hhCounters = 256

  def heavyHitters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val users = Tables.events(s, d).select(col("user_id")).as[Long]
    // ONE summary pass emits both the MG candidates (tag 0) and the
    // partition row count (tag 1) — the total must not cost a second full
    // scan; the summary is tiny (≤ counters+1 rows per partition) and is
    // persisted so candidates + total don't recompute it
    val summary = users.mapPartitions { it =>
      val counters = scala.collection.mutable.LongMap.empty[Long]
      var rows = 0L
      it.foreach { v =>
        rows += 1
        if (counters.contains(v)) counters(v) += 1
        else if (counters.size < hhCounters) counters(v) = 1L
        else {
          val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
          counters.foreachEntry((k, c) => if (c == 1L) dead += k else counters(k) = c - 1)
          dead.foreach(counters.remove)
        }
      }
      counters.keysIterator.map(k => (0, k)) ++ Iterator((1, rows))
    }.toDF("tag", "v").persist()
    val (total, cands) =
      try {
        val t = summary.where(col("tag") === 1).agg(sum(col("v"))).head().getLong(0)
        val c = summary.where(col("tag") === 0).select("v").as[Long].collect().distinct
        (t, c)
      } finally { summary.unpersist(blocking = false); () }
    // candidate set is driver-small (≤ counters × partitions) but NOT
    // O(1): compiling it into an IN-list predicate grows the generated
    // code with counters×partitions literals (a 4000-partition cluster ⇒
    // a megabyte-scale predicate). A broadcast LEFT SEMI join is the
    // size-safe shape: the candidate table ships once per executor, the
    // probe is a hash lookup, and the recount shuffle still carries only
    // candidate rows.
    val candDf = cands.toSeq.toDF("user_id")
    Tables.events(s, d)
      .join(broadcast(candDf), Seq("user_id"), "left_semi")
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * hhK > total)
  }

  val heavyHittersSql: String =
    s"""SELECT user_id, COUNT(*) AS cnt FROM events
       |GROUP BY user_id
       |HAVING COUNT(*) * $hhK > (SELECT COUNT(*) FROM events)""".stripMargin
}
