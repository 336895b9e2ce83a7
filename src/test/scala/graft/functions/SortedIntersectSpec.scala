package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused merge-count kernel must equal `size(array_intersect)` on
  * every sorted-distinct input — it replaced array_intersect in the dedup
  * verification hot paths, so any divergence is an oracle-hash break.
  */
class SortedIntersectSpec extends SparkSpec {

  test("property: merge count equals size(array_intersect) on random sorted-distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val rows = (0 until 400).map { i =>
      def arr(): Array[Long] =
        (0 until rnd.nextInt(40)).map(_ => rnd.nextInt(60).toLong).distinct.sorted.toArray
      (i.toLong, arr(), arr())
    } :+ ((400L, Array.empty[Long], Array(1L, 2L, 3L))) :+
      ((401L, Array(5L), Array(5L))) :+
      ((402L, Array.empty[Long], Array.empty[Long]))
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        TextFunctions.sortedIntersectCount(col("a"), col("b")).as("fused"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
    val bad = df.where(col("fused") =!= col("builtin")).collect()
    assert(bad.isEmpty, s"divergence on ${bad.take(5).mkString(", ")}")
  }

  test("interpreted eval matches codegen path") {
    import spark.implicits._
    val df = Seq((Array(1L, 3L, 9L, 12L), Array(2L, 3L, 12L, 40L)))
      .toDF("a", "b")
    // codegen path (whole-stage over a projection)
    val gen = df.select(TextFunctions.sortedIntersectCount(col("a"), col("b"))).head().getInt(0)
    // interpreted path (expression eval outside codegen)
    val e = SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1L, 3L, 9L, 12L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(2L, 3L, 12L, 40L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    assert(gen == 2 && e.eval(null) == 2)
  }

  test("SQL front door: sorted_intersect_count registered") {
    graft.functions.TextFunctions.register(spark)
    val n = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS n")
      .head().getInt(0)
    assert(n == 2)
  }
}
