package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The §2.7 Generator tier: `graft_shingles` must emit exactly the
  * kernel-contract shingles (split on single spaces, trailing empties
  * kept, word 3-grams, none under 3 tokens), with positions, and behave
  * like Spark's own generators on NULL/empty input (no rows).
  */
class ShingleGeneratorSpec extends SparkSpec {

  test("generator rows match the declarative 3-gram expansion") {
    import spark.implicits._
    graft.functions.TextFunctions.register(spark)
    val docs = Seq(
      (1L, "a b c d"), (2L, "x y"), (3L, ""), (4L, "one two three"),
      (5L, "a  b c")) // double space → empty token, kept
      .toDF("id", "text")
    docs.createOrReplaceTempView("sg_docs")
    val gen = spark.sql(
      """SELECT id, pos, shingle FROM sg_docs
        |LATERAL VIEW graft_shingles(text) t AS pos, shingle""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val expected = docs
      .select(col("id"), posexplode(expr(
        """CASE WHEN size(split(text, ' ')) >= 3
          |THEN transform(sequence(0, size(split(text, ' ')) - 3),
          |     i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1], split(text, ' ')[i+2]))
          |ELSE array() END""".stripMargin)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    assert(gen.toSeq == expected.toSeq)
    assert(gen.exists(_._1 == 5L)) // empty tokens participate
    assert(!gen.exists(_._1 == 2L) && !gen.exists(_._1 == 3L))
  }

  test("NULL text produces no rows (and no NPE)") {
    import spark.implicits._
    graft.functions.TextFunctions.register(spark)
    Seq((1L, Option("a b c")), (2L, Option.empty[String])).toDF("id", "text")
      .createOrReplaceTempView("sg_null")
    val out = spark.sql(
      """SELECT id, shingle FROM sg_null
        |LATERAL VIEW graft_shingles(text) t AS pos, shingle""".stripMargin).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
  }
}
