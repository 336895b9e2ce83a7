package graft.tools

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the MinHash pipeline at sf0.1. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("profile", "32")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }
    val docs = Tables.documents(spark, d)
    time("scan")(docs.count())
    time("scan2")(docs.count())
    val toks = docs.withColumn("toks", split(col("text"), " "))
    time("tokens")(toks.select(sum(size(col("toks")))).head().getLong(0))
    val sh = toks.withColumn("shingles", expr(
      """CASE WHEN size(toks) >= 3
        |     THEN transform(sequence(0, size(toks) - 3),
        |                    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |     ELSE array() END""".stripMargin))
    time("shingles")(sh.select(sum(size(col("shingles")))).head().getLong(0))
    val hs = sh.withColumn("hs", expr(
      "transform(shingles, g -> CAST(conv(substr(md5(g), 1, 13), 16, 10) AS BIGINT))"))
    time("md5")(hs.select(sum(size(col("hs")))).head().getLong(0))
    val mh = (0 until 6).foldLeft(hs) { (df, j) =>
      df.withColumn(s"mh$j", expr(s"array_min(transform(hs, h -> pmod(h * ${37 + 101 * j}L + ${1009 * j}L, 1000000007L)))"))
    }
    time("minhash-full") { mh.select(max(col("mh0"))).head(); 0L }
    time("sig-via-operator")(graft.operators.Dedup.minhashSignatures(spark, d).count())
    spark.stop()
  }
}
