package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Time named dims AND count the Spark jobs each submits — the round-19
  * action-ladder detector: a 1–2 s dim that submits 5+ jobs is paying
  * scheduler round trips, not compute (guide §2.6 / round-18 change #2–4
  * precedent: fuse or overlap the ladder).
  *
  * Run: sbt "runMain graft.tools.JobCount <sfDir> <query> [query...]"
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = graft.core.GraftSession.local("graft-jobcount")
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val verbose = sys.env.get("GRAFT_JOBCOUNT_VERBOSE").contains("1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        starts.put(j.jobId, System.nanoTime())
        ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(j.jobId)
        if (verbose && t0 != 0L)
          System.err.println(f"[job] ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3fs")
        ()
      }
    })
    // bench-shaped warmup
    spark.range(1000000).selectExpr("sum(id)").head()
    val warmDir = java.nio.file.Files.createTempDirectory("graft-jobcount-warm").toString + "/t"
    spark.range(10000).selectExpr("id", "CAST(id AS STRING) AS s", "id * 1.5 AS v")
      .write.parquet(warmDir)
    spark.read.parquet(warmDir).groupBy("s")
      .agg(org.apache.spark.sql.functions.sum("v")).count()

    val out = names.map { name =>
      spark.sparkContext.setJobDescription(name)
      Thread.sleep(50) // let listener drain
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50)
        f"$name%s=$s%.3f/j${jobs.get() - j0}"
      } catch {
        case e: Throwable =>
          System.err.println(s"[jobcount] $name failed: ${e.getMessage}")
          s"$name=-1"
      }
    }
    println("JOBCOUNT " + out.mkString(" "))
    spark.stop()
  }
}
