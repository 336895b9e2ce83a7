package graft.plans

import graft.SparkSpec

/** The extensions entry point injects the native functions into SQL —
  * GraftSession installs `GraftExtensions` via withExtensions, so plain
  * `spark.sql` resolves them with no manual registration.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("injected functions resolve in SQL") {
    val r = spark.sql(
      """SELECT
        |  dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |        array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |  cosine_f(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |           array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |  size(minhash_sig('a b c d e', 6)) AS k,
        |  size(shingle_hashes('a b c d e')) AS sh
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getInt(2) == 6)
    assert(r.getInt(3) == 3) // 5 tokens → 3 shingles, all distinct
  }

  test("expression-tier results match the Column API") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("x y z w v u t").toDF("text")
    val viaSql = {
      df.createOrReplaceTempView("ext_t")
      spark.sql("SELECT minhash_sig(text, 6) AS m FROM ext_t").head().getSeq[Long](0)
    }
    val viaApi = df.select(graft.functions.TextFunctions.minhashSig(col("text"), 6).as("m"))
      .head().getSeq[Long](0)
    assert(viaSql == viaApi)
  }
}
