package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for heavy-hitter keys — the hand-rolled
  * counterpart to AQE's skew-join splitting, for the aggregation side
  * (AQE only splits join partitions). At 100 TB a single hot key (one
  * celebrity user, one empty-string token) can pin a task for hours; the
  * standard fix is salting: spray the hot key over S sub-keys, partially
  * aggregate, then merge the S partials.
  */
object Skew {

  /** Two-stage salted aggregation: count+sum per key, final result
    * identical to a direct groupBy (the oracle proves it) but the first
    * shuffle distributes each key over `salts` partitions, bounding any
    * single task at 1/salts of the hottest key.
    */
  def saltedAgg(df: DataFrame, key: String, valueCol: Column, salts: Int): DataFrame =
    df
      .withColumn("_salt", pmod(crc32(col(key).cast("string")) + spark_partition_id(), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_pn"), sum(valueCol).as("_ps"))
      .groupBy(col(key))
      .agg(sum(col("_pn")).as("n"), sum(col("_ps")).as("total"))

  /** Value count per event type via salted two-stage aggregation — the
    * events table's type column has only 5 distinct values, i.e. maximal
    * skew for a 32-partition shuffle: exactly the shape salting fixes.
    */
  def eventTypeTotalsSalted(s: SparkSession, d: String): DataFrame =
    saltedAgg(
      Tables.events(s, d),
      "event_type",
      col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)),
      salts = 16
    ).select(col("event_type"), col("n"), col("total").cast("double").as("total"))

  val eventTypeTotalsSaltedSql: String =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY event_type""".stripMargin

  /** Salted equi join for skewed fact keys: the fact side gets a random-ish
    * but DETERMINISTIC salt in [0, salts), the dimension side is exploded
    * into `salts` replicas, and the join runs on (key, salt) — every fact
    * partition of a hot key meets its own dimension copy, so no task
    * receives more than ~1/salts of that key. The result set is row-for-row
    * identical to the unsalted join (the oracle proves it); the cost is a
    * salts× dimension blow-up, which is the right trade when the dimension
    * is small and the fact key is hot.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(crc32(col(key).cast("string")) + spark_partition_id(), lit(salts)))
    val replicated = dim.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Per-event-type reference values joined onto the skewed events fact via
    * [[saltedJoin]] then aggregated — oracle-identical to the plain join.
    */
  def eventTypeJoinSalted(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.events(s, d)
      .groupBy("event_type").agg(min("user_id").as("first_user"))
    saltedJoin(Tables.events(s, d), dim, "event_type", salts = 16)
      .groupBy("event_type", "first_user")
      .agg(count(lit(1)).as("n"))
  }

  val eventTypeJoinSaltedSql: String =
    """SELECT e.event_type, d.first_user, COUNT(*) AS n
      |FROM events e
      |JOIN (SELECT event_type, MIN(user_id) AS first_user FROM events GROUP BY 1) d
      |  ON e.event_type = d.event_type
      |GROUP BY 1, 2""".stripMargin
}
