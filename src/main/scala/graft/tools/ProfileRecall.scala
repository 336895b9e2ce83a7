package graft.tools

import org.apache.spark.sql.functions._

/** Component timing for the semantic recall face at a given corpus dir —
  * separates the top-2 ranking, the sampled assignment, and the blocked
  * all-pairs truth scoring so a scale regression is attributable.
  * Run: sbt "runMain graft.tools.ProfileRecall <dir>"
  */
object ProfileRecall {
  def main(args: Array[String]): Unit = {
    val d = args.head
    val spark = graft.core.GraftSession.local("profile-recall")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").head()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  n=$n")
    }
    val emb = graft.core.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val p = math.min(1000L, math.max(1L, 5000L * 1000L / n))
    val pred = expr(s"pmod(CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 13), 16, 10) AS BIGINT), 1000) < $p")
    time("sampled_count")(emb.where(pred).count())
    time("assign_sampled")(graft.operators.Similarity.ivfAssign(spark, d).where(pred).count())
    time("assign_top2_sampled")(graft.operators.Similarity.assignTop2(spark, d).where(pred).count())
    time("truth_cand")(graft.operators.Similarity.semanticRecallTruthCandProbe(spark, d).count())
    time("truth_scored")(graft.operators.Similarity.semanticRecallScoredProbe(spark, d).count())
    time("recall_face")(graft.operators.Similarity.semanticRecall(spark, d).count())
    spark.stop()
  }
}
