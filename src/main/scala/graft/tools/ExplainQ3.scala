package graft.tools
object ExplainQ3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("explain", "32")
    val df = graft.operators.Relational.q3ShippingPriority(spark, "/root/testdata/sf0.1")
    df.explain("formatted")
    val t0 = System.nanoTime(); df.count(); println(s"q3 count took ${(System.nanoTime()-t0)/1e9}s")
    val t1 = System.nanoTime(); df.count(); println(s"q3 2nd run ${(System.nanoTime()-t1)/1e9}s")
    spark.stop()
  }
}
