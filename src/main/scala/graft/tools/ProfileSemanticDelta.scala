package graft.tools

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Round-17 bisection probe for the `dedup_semantic_delta` movement
  * (round-16 verdict "what's wrong" #2): times each phase of
  * [[Similarity.semanticDeltaPairs]] separately over the same memoized
  * index — (a) the max(vec_id) cutoff scan, (b) the blocked bipartite
  * candidate kernel, (c) the embedding joins + cosine scoring — plus a
  * control read of the raw index. Each phase twice; prints JSON lines.
  */
object ProfileSemanticDelta {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("graft-profile-semdelta")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").head()

    val root = Similarity.ivfIndexFor(spark, sfDir)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    (1 to 2).foreach { round =>
      val data = spark.read.parquet(root)
      val rawS = timed(data.count())
      var cutoff = 0L
      val cutoffS = timed { cutoff = data.agg(max(col("vec_id"))).head().getLong(0) / 2 }
      val slim = data.select(col("cell"), col("vec_id").as("doc_id"))
      var candN = 0L
      val candS = timed {
        candN = Dedup.deltaPairsBlockedFor(slim, slim.where(col("doc_id") > cutoff), Seq("cell")).count()
      }
      var fullN = 0L
      val fullS = timed { fullN = Similarity.semanticDeltaPairs(spark, sfDir).count() }
      println(s"""{"probe":"semantic_delta","round":$round,"raw_scan_s":$rawS,""" +
        s""""cutoff_s":$cutoffS,"cand_s":$candS,"cand_n":$candN,""" +
        s""""full_s":$fullS,"full_n":$fullN}""")
    }
    spark.stop()
  }
}
