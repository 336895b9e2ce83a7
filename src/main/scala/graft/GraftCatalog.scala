package graft

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL front door: register the corpus tables as temp views and graft's
  * native functions in one call, so a plain `spark.sql(...)` session has
  * the full engine surface — the "switch your queries over" path for users
  * coming from SQL, complementing the DataFrame API the operators use.
  *
  * `events` is registered in its normalized form (exact `ts_us` micros +
  * µs-precision `ts`, see [[graft.core.Tables.events]]) so SQL users get
  * the same timestamp discipline as the operator layer.
  */
object GraftCatalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "documents", "embeddings")

  /** Idempotent: temp views are cheap to re-create and always reflect `d`.
    * Pass `only` to register a subset — each registration reads that
    * table's parquet footer, so registering all 11 costs ~1.5 s cold.
    */
  def register(s: SparkSession, d: String, only: Seq[String] = Nil): Unit = {
    val wanted = if (only.nonEmpty) only else tableNames :+ "events"
    wanted.foreach {
      case "events" => Tables.events(s, d).createOrReplaceTempView("events")
      case t        => Tables.table(s, d, t).createOrReplaceTempView(t)
    }
    graft.functions.VectorFunctions.register(s)
    graft.functions.TextFunctions.register(s)
  }

  /** Register + run: the one-liner SQL entry point. `tables` limits the
    * registration to what the query reads (all tables when empty).
    */
  def sql(s: SparkSession, d: String, query: String, tables: Seq[String] = Nil): DataFrame = {
    register(s, d, tables)
    s.sql(query)
  }
}
