package graft.tools

/** Time individual declared queries (count-only, warm session):
  * sbt "runMain graft.tools.TimeQuery <sfDir> <name> [name...]"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val d = args.head
    val spark = graft.core.GraftSession.local("time-query")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").head()
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, d).count()
      println(f"TIMED $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    spark.stop()
  }
}
