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

  /** Idempotent: temp views are cheap to re-create and always reflect `d`. */
  def register(s: SparkSession, d: String): Unit = {
    tableNames.foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    Tables.events(s, d).createOrReplaceTempView("events")
    graft.functions.VectorFunctions.register(s)
    graft.functions.TextFunctions.register(s)
  }

  /** Register + run: the one-liner SQL entry point. */
  def sql(s: SparkSession, d: String, query: String): DataFrame = {
    register(s, d)
    s.sql(query)
  }
}
