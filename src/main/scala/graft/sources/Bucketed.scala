package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the co-location technique for repeated big joins
  * (SURVEY.md "Partitioning & shuffle"): write both sides bucketed+sorted on
  * the join key and every subsequent equi join on that key is shuffle-free
  * (bucket pruning gives the same win for point predicates).
  *
  * At 100 TB this converts the dominant recurring cost (lineitem⋈orders
  * style shuffles of the fact table) into a one-time write-side sort: the
  * reference's analog is choosing the file layout once at ingest
  * (static stride vs index+heap) so reads never re-organize data.
  */
object Bucketed {

  /** Write `df` as a managed parquet table bucketed and sorted by `key`. */
  def write(df: DataFrame, tableName: String, key: String, numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(tableName)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Join two tables bucketed on the same key with the same bucket count —
    * planner produces a sort-merge join with NO exchange on either side.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
