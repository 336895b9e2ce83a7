package graft.tools

import org.apache.spark.sql.functions._

/** Minimal reproducer for codegen health of the native kernels: evaluates
  * each over a couple of rows with DEBUG logging so a Janino failure dumps
  * the generated source (WARN "Expr codegen error" = silent interpreter
  * fallback = hot-path regression).
  */
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("codegen-check", "2")
    spark.sparkContext.setLogLevel("DEBUG")
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f, 4.0f)), (2L, Array(0.5f, 1.5f, 2.5f, 3.5f)))
      .toDF("id", "emb")
    val cb = Seq(Seq(0.0f, 0.0f, 1.0f, 1.0f), Seq(1.0f, 1.0f, 2.0f, 2.0f))
    val q = Seq(0.25f, 0.5f, 0.75f, 1.0f)
    df.select(graft.functions.VectorFunctions.pqAdcF(col("emb"),
      typedLit(cb), typedLit(q), 2).as("adc")).collect().foreach(println)
    // the real failing shape: the kernel inside the sf0.001 ADC query
    graft.operators.Similarity.pqAdcSearch(spark, "/root/testdata/sf0.001")
      .collect().foreach(println)
  }
}
