package graft.tools

object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("profivf", "32")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    t("emb-count")(graft.core.Tables.embeddings(spark, d).count())
    t("ivf-assign-1")(graft.operators.Similarity.ivfAssign(spark, d).count())
    t("ivf-assign-2")(graft.operators.Similarity.ivfAssign(spark, d).count())
    t("cell-stats")(graft.operators.Similarity.ivfCellStats(spark, d).count())
    spark.stop()
  }
}
