package graft.tools

import org.apache.spark.sql.functions._

object ProfileSig {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("profsig", "32")
    val d = "/root/testdata/sf0.1"
    val sig = graft.operators.Dedup.minhashSignatures(spark, d)
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"STAGE $name%-20s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    t("warmup-count")(sig.count())
    t("count")(sig.count())
    t("full-agg")(sig.agg(sum(col("mh0") + col("mh1") + col("mh2") + col("mh3") + col("mh4") + col("mh5"))).head())
    t("full-agg2")(sig.agg(sum(col("mh0") + col("mh1") + col("mh2") + col("mh3") + col("mh4") + col("mh5"))).head())
    sig.explain("formatted")
    spark.stop()
  }
}
