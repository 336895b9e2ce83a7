package graft.tools

/** Time a named subset of declared query dims with the EXACT bench
  * methodology (same session tuning, same warmup shape, same `.count()`
  * action, cold one-shot per dim) — the round-18 optimization loop's
  * fast A/B harness: re-running all 283 dims per code change would cost
  * ~7 min per sample where this costs the subset.
  *
  * Run: sbt "runMain graft.tools.TimeDims <sfDir> <query> [query...]"
  */
object TimeDims {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = graft.core.GraftSession.local("graft-timedims")
    spark.sparkContext.setLogLevel("WARN")
    // same session/JIT warmup as Bench (no input table touched)
    spark.range(1000000).selectExpr("sum(id)").head()
    val warmDir = java.nio.file.Files.createTempDirectory("graft-timedims-warm").toString + "/t"
    spark.range(10000).selectExpr("id", "CAST(id AS STRING) AS s", "id * 1.5 AS v")
      .write.parquet(warmDir)
    val warm = spark.read.parquet(warmDir)
    warm.where(org.apache.spark.sql.functions.col("id") > 100)
      .groupBy("s").agg(org.apache.spark.sql.functions.sum("v")).count()
    warm.withColumn("rn", org.apache.spark.sql.functions.row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("s").orderBy("id"))).count()

    val out = names.map { name =>
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        f"$name%s=$s%.3f"
      } catch {
        case e: Throwable =>
          System.err.println(s"[timedims] $name failed: ${e.getMessage}")
          s"$name=-1"
      }
    }
    println("TIMEDIMS " + out.mkString(" "))
    spark.stop()
  }
}
