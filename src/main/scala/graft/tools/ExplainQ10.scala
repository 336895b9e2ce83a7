package graft.tools
object ExplainQ10 {
  def main(args: Array[String]): Unit = {
    val s = graft.core.GraftSession.local("explain-q10", "8")
    val df = graft.operators.Relational.q10ReturnedRevenue(s, "/root/testdata/sf0.01")
    df.count() // finalize AQE
    println("=== Q10 FINAL PLAN ===")
    println(df.queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))
    s.stop()
  }
}
