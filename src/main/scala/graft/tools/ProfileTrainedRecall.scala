// scratch timing main — not part of the library
package graft.operators

import org.apache.spark.sql.functions._

/** Phase breakdown of ivfTrainedRecall at sf0.1 (lives in graft.operators
  * for access to the private pieces). Run:
  * sbt "runMain graft.operators.ProfileTrainedRecall [sfDir]"
  */
object ProfileTrainedRecall {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.core.GraftSession.local("prof-trained", "32")
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    def t(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PHASE $n%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    s.range(1000000).selectExpr("sum(id)").head()
    val emb = graft.core.Tables.embeddings(s, d)
    t("emb_count")(emb.count())
    t("anchor_centroids")(Similarity.ivfAssign(s, d).queryExecution) // plan only
    var anchors: Array[Array[Float]] = null
    var trained: Array[Array[Float]] = null
    t("collect_anchor_centroids") {
      anchors = emb.where(col("vec_id") < Similarity.cellsFor(emb.count()).toLong)
        .orderBy("vec_id").collect().map(_.getSeq[Float](1).toArray)
    }
    t("lloyd_train")({ trained = Similarity.trainedCentroids(s, d) })
    val panel = emb.where(col("vec_id") < Similarity.panelSize.toLong)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    val scored = emb.crossJoin(broadcast(panel))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("sim",
        graft.functions.VectorFunctions.cosineF(col("embedding"), col("qe")))
      .select("qid", "vec_id", "sim")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("scored_materialize")(scored.count())
    val exact = scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= Similarity.ivfK).select("qid", "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("exact_topk")(exact.count())
    var panelVecs: Array[(Long, Array[Float])] = null
    t("panel_collect") {
      panelVecs = panel.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    }
    def hits(name: String, cs: Array[Array[Float]]): Unit = t(s"hits_$name") {
      val probePairs = panelVecs
        .flatMap { case (qid, q) => Similarity.rankedCells(q, cs).take(Similarity.ivfNprobe).map(c => (qid, c)) }
        .toSeq.toDF("qid", "cell")
      val members = Similarity.assignWith(s, d, cs)
        .join(broadcast(probePairs), Seq("cell")).select("qid", "vec_id")
      val approx = scored.join(members, Seq("qid", "vec_id"), "left_semi")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= Similarity.ivfK).select("qid", "vec_id")
      exact.join(approx, Seq("qid", "vec_id")).count()
    }
    hits("anchor_cold", anchors)
    hits("anchor_warm", anchors)
    hits("trained_cold", trained)
    hits("trained_warm", trained)
    s.stop()
  }
}
