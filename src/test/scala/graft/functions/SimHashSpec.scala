package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native SimHash16 kernel must be bit-identical to the declarative
  * explode→groupBy vote it replaced (which is what the DuckDB oracle
  * reproduces), and must keep the query map-only.
  */
class SimHashSpec extends SparkSpec {

  test("kernel simhash equals the declarative explode/groupBy vote on every document") {
    val kernel = graft.operators.Dedup.simhashSignatures(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val declarative = graft.operators.Dedup.simhashSignaturesDeclarative(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(kernel.nonEmpty)
    assert(kernel == declarative)
  }

  test("tokenHash99 matches the declarative conv(substr(md5(...)))") {
    import spark.implicits._
    val toks = Seq("hello", "widget", "", "a b", "ünïcode")
    val declarative = toks.toDF("t")
      .select(expr("CAST(conv(substr(md5(concat(t, '|99')), 1, 15), 16, 10) AS BIGINT)"))
      .collect().map(_.getLong(0))
    val kernel = toks.map(ShingleKernel.tokenHash99)
    assert(kernel == declarative.toSeq)
  }

  test("pigeonhole hamming pairs equal the brute-force all-pairs result") {
    // the 3-piece pigeonhole is provably lossless for hamming <= 2; this
    // pins the implementation to the proof with an in-test brute force
    // over the collected signatures (gate corpus: trivial driver work)
    val sig = graft.operators.Dedup.simhashSignatures(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (a, ha) <- sig; (b, hb) <- sig if a < b
      h = java.lang.Long.bitCount(ha ^ hb)
      if h <= graft.operators.Dedup.simhashHammingMax
    } yield (a, b, h)).toSet
    val got = graft.operators.Dedup.simhashNearDupPairs(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want,
      s"pigeonhole diverged from brute force: missing=${(want -- got).take(5)}, extra=${(got -- want).take(5)}")
    assert(want.nonEmpty, "expected some hamming<=2 pairs at gate scale")
  }

  test("the simhash query plan has no shuffle (map-only scan projection)") {
    val plan = graft.operators.Dedup.simhashSignatures(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected a map-only plan:\n$plan")
  }

  test("interpreted eval agrees with codegen") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "", "one").toDF("text")
    val viaCodegen = df.select(TextFunctions.simhash16(col("text"))).collect().map(_.getLong(0))
    val viaInterp = Seq("the quick brown fox", "", "one")
      .map(t => ShingleKernel.simhash16(org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    assert(viaCodegen.toSeq == viaInterp)
  }
}
