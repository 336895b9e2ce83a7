package graft.tools

import java.nio.file.{Files, Paths}

/** Plan artifacts for the semantic-recall SCORED stream — the face itself
  * is eager (its declared output is a 6-row LocalRelation), so the plan
  * evidence for the panel-fusion rewrite is the scored stream's chain:
  * the broadcast-join formulation (probe kept as the before-comparison)
  * vs the fused RecallPanelScore shape the face now executes.
  *
  * Run: sbt "runMain graft.tools.PlanRecallScored <outDir>"
  * writes <outDir>/dedup_semantic_recall_scored_{joined,fused}.txt
  */
object PlanRecallScored {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r19")
    Files.createDirectories(Paths.get(outDir))
    val spark = graft.core.GraftSession.local("plan-recall-scored", "32")
    spark.sparkContext.setLogLevel("WARN")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"$name.txt"), txt)
      println(s"wrote $name")
    }
    dump("dedup_semantic_recall_scored_joined",
      graft.operators.Similarity.semanticRecallScoredProbe(spark, d))
    dump("dedup_semantic_recall_scored_fused",
      graft.operators.Similarity.semanticRecallScoredFusedProbe(spark, d))
    spark.stop()
  }
}
