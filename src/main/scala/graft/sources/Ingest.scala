package graft.sources

import graft.core.VectorTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingestion connectors — the format surface the reference lacks entirely
  * (its only format is one custom binary layout under the reference's
  * src/services directory, SURVEY.md §2.2): CSV / JSON-lines / Parquet readers that
  * land data in a [[VectorTable]] with dense rowids, plus export back out.
  *
  * Everything is Spark's native, splittable, predicate-pushing readers —
  * at 100 TB a CSV ingest is a parallel scan with per-partition parsing,
  * and the append path batches it into rowid-ordered parquet.
  */
object Ingest {

  /** Read CSV (header, explicit schema — schema inference reads the data
    * twice and is banned at scale).
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** Read JSON-lines with an explicit schema. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Read ORC (columnar, predicate-pushing — the other warehouse-native
    * format Spark ships).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Land any DataFrame into `table` (dense rowid assignment, manifest
    * commit). Returns the first assigned rowid.
    */
  def intoTable(df: DataFrame, table: VectorTable): Long = table.append(df)

  /** Export a table's content (without the internal rowid) to a sink
    * format; `partitionBy` for hive-style layout at scale.
    */
  def export(table: VectorTable, path: String, format: String = "parquet",
             partitionBy: Seq[String] = Nil): Unit = {
    val w = table.scan().drop(VectorTable.ROWID).write.mode("overwrite").format(format)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }
}
