// scratch timing main — not part of the library
package graft.tools
import org.apache.spark.sql.functions._
object TimeTrained {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.core.GraftSession.local("time-trained", "32")
    s.sparkContext.setLogLevel("WARN")
    def t(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"TIMING $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // warm the session like Bench does
    s.range(1000000).selectExpr("sum(id)").head()
    t("warm_read")(graft.core.Tables.embeddings(s, d).count())
    t("ivf_train_only")(graft.operators.Similarity.trainedCentroids(s, d))
    t("ivf_trained_recall_after_train")(graft.operators.Similarity.ivfTrainedRecall(s, d).count())
    t("pq_train_only")(graft.operators.Similarity.trainedPqCodebook(s, d))
    t("pq_trained_error_after_train")(graft.operators.Similarity.pqTrainedError(s, d).count())
    s.stop()
  }
}
