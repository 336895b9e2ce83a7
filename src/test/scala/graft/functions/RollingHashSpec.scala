package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The O(1)-per-character rolling kernel must be bit-identical to the
  * direct O(k)-per-window polynomial it replaces (which is what the
  * DuckDB oracle computes), and the repeated-span operator must find a
  * planted cross-document span.
  */
class RollingHashSpec extends SparkSpec {

  private def direct(s: String, k: Int, stride: Int): Seq[Long] = {
    val M = ShingleKernel.RollM
    val B = ShingleKernel.RollB
    (0 to s.length - k).filter(_ % stride == 0).map { i =>
      s.substring(i, i + k).foldLeft(0L)((acc, c) => (acc * B + (c & 0x7f)) % M)
    }
  }

  test("rolling kernel equals the direct per-window polynomial (windows, strides, edges)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps on running",
      "aaaaaaaaaaaaaaaaaaaaaaaa", // degenerate repeats
      "short", "", "x" * 40,       // below / exactly at the window
      (0 until 300).map(i => ('a' + i % 26).toChar).mkString)
    for (k <- Seq(5, 40); stride <- Seq(1, 4, 7); t <- texts) {
      val got = ShingleKernel.rollingHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), k, stride)
        .toLongArray().toSeq
      assert(got == direct(t, k, stride), s"k=$k stride=$stride text=${t.take(20)}…")
    }
  }

  test("expression matches the kernel through codegen and the declarative SQL fold") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sf()).limit(50)
    val viaKernel = docs
      .select(col("doc_id"), TextFunctions.rollingHashes(col("text"), 40, 4).as("h"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toMap
    val M = ShingleKernel.RollM
    val B = ShingleKernel.RollB
    val viaSql = docs.select(col("doc_id"), expr(
      s"""CASE WHEN length(text) < 40 THEN array()
         |ELSE transform(
         |  filter(sequence(0, length(text) - 40), i -> i % 4 = 0),
         |  i -> aggregate(
         |    transform(sequence(1, 40), j -> CAST(ascii(substring(text, i + j, 1)) % 128 AS BIGINT)),
         |    CAST(0 AS BIGINT), (acc, c) -> (acc * ${B}L + c) % ${M}L))
         |END""".stripMargin).as("h"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toMap
    assert(viaKernel.nonEmpty)
    assert(viaKernel == viaSql)
    // interpreted eval agrees with codegen
    val t = "the same span appears in both of these documents verbatim today"
    val interp = ShingleKernel.rollingHashes(
      org.apache.spark.unsafe.types.UTF8String.fromString(t), 40, 4).toLongArray().toSeq
    val codegen = Seq(t).toDF("text")
      .select(TextFunctions.rollingHashes(col("text"), 40, 4))
      .head().getSeq[Long](0).toSeq
    assert(interp == codegen)
  }

  test("a planted cross-document 50-char span is detected; disjoint docs are not") {
    import spark.implicits._
    import graft.operators.Dedup
    val span = "this exact fifty character span repeats in two docs!"
    val docs = Seq(
      (1L, s"prefix one ${span} suffix alpha"),
      (2L, s"completely different lead-in ${span} and tail"),
      (3L, "a third document sharing nothing with the others at all, long enough to gram"))
      .toDF("doc_id", "text")
    val hits = docs
      .select(col("doc_id"), explode(TextFunctions
        .rollingHashes(col("text"), Dedup.repeatedSpanWindow, 1)).as("h"))
      .groupBy("h").agg(countDistinct("doc_id").as("n"))
      .where(col("n") >= 2)
    assert(hits.count() > 0, "planted shared span not detected")
    val hitDocs = docs
      .select(col("doc_id"), explode(TextFunctions
        .rollingHashes(col("text"), Dedup.repeatedSpanWindow, 1)).as("h"))
      .join(hits.select("h"), "h")
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(hitDocs == Set(1L, 2L), s"expected only the planted pair, got $hitDocs")
  }
}
