package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named declared queries — the round-19
  * plan-artifact writer (plans/r19/<query>_{before,after}.txt).
  *
  * Run: sbt "runMain graft.tools.PlanFor <outDir> <suffix> <query> [query...]"
  * writes <outDir>/<query>_<suffix>.txt for each name.
  */
object PlanFor {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    Files.createDirectories(Paths.get(outDir))
    val spark = graft.core.GraftSession.local("planfor", "32")
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"wrote ${name}_$suffix")
    }
    spark.stop()
  }
}
