package graft.tools
object BenchClusters {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("bc", "32")
    spark.range(1000000).selectExpr("sum(id)").head()
    graft.operators.Dedup.jaccardVerifiedPairs(spark, "/root/testdata/sf0.1").count()
    val t0 = System.nanoTime()
    val n = graft.operators.Dedup.duplicateClusters(spark, "/root/testdata/sf0.1").count()
    println(f"CLUSTERS sf0.1: $n rows in ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
