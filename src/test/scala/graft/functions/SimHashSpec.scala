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

  test("distributed (pc,pv) self-join pairs equal the grouped collect_set form pair-for-pair") {
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val joined = collect(graft.operators.Dedup.simhashNearDupPairs(spark, sf()))
    val grouped = collect(graft.operators.Dedup.simhashNearDupPairsGrouped(spark, sf()))
    assert(joined == grouped,
      s"join form diverged from grouped form: missing=${(grouped -- joined).take(5)}, extra=${(joined -- grouped).take(5)}")
    assert(joined.nonEmpty)
  }

  test("64-bit kernel matches an independent driver-side md5 reference") {
    val docs = Seq("the quick brown fox jumps", "", "one", "a a a b", "ünïcode tökens here")
    def refHash(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((tok + "|99").getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((v, i) => (v << 8) | (d(i) & 0xffL))
    }
    def refSim(text: String): Long = {
      val votes = new Array[Int](64)
      text.split(" ", -1).foreach { t =>
        val h = refHash(t)
        (0 until 64).foreach(b => if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
      }
      (0 until 64).foldLeft(0L)((o, b) => if (votes(b) > 0) o | (1L << b) else o)
    }
    import spark.implicits._
    val viaExpr = docs.toDF("text")
      .select(TextFunctions.simhash64(org.apache.spark.sql.functions.col("text")))
      .collect().map(_.getLong(0)).toSeq
    assert(viaExpr == docs.map(refSim))
    val viaInterp = docs.map(t =>
      ShingleKernel.simhash64(org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    assert(viaInterp == docs.map(refSim), "interpreted eval diverged from codegen/reference")
  }

  test("64-bit pigeonhole pairs equal brute force, and the width rule scales with the corpus") {
    import graft.operators.Dedup
    assert(Dedup.simhashBitsFor(500) == 16)
    assert(Dedup.simhashBitsFor(Dedup.simhashWideThreshold) == 16)
    assert(Dedup.simhashBitsFor(Dedup.simhashWideThreshold + 1) == 64)
    assert(Dedup.simhashBitsFor(100000000L) == 64)
    val sig64 = Dedup.simhashSignatures64(spark, sf())
    val rows = sig64.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      h = java.lang.Long.bitCount(ha ^ hb)
      if h <= Dedup.simhashHammingMax
    } yield (a, b, h)).toSet
    val got = Dedup.simhashNearDupPairsWith(sig64, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want,
      s"64-bit pigeonhole diverged from brute force: missing=${(want -- got).take(5)}, extra=${(got -- want).take(5)}")
  }

  test("property: pigeonhole pieces are lossless for hamming <= 2 at BOTH widths") {
    // pure driver-side sweep of the mathematical claim the join relies on:
    // flip <= 2 random bits of a random signature; the pair must share at
    // least one (piece, value) under the width's piece split
    val rnd = new scala.util.Random(2024)
    def pieces16(h: Long) = Seq((0, h & 63), (1, (h >> 6) & 31), (2, (h >> 11) & 31))
    def pieces64(h: Long) = (0 until 4).map(p => (p, (h >> (16 * p)) & 0xffff))
    (1 to 2000).foreach { _ =>
      val h16 = rnd.nextLong() & 0xffff
      val h64 = rnd.nextLong()
      def flip(h: Long, width: Int): Long =
        (0 until rnd.nextInt(3)).foldLeft(h)((x, _) => x ^ (1L << rnd.nextInt(width)))
      val g16 = flip(h16, 16)
      val g64 = flip(h64, 64)
      if (java.lang.Long.bitCount(h16 ^ g16) <= 2)
        assert(pieces16(h16).intersect(pieces16(g16)).nonEmpty, s"16-bit miss: $h16 vs $g16")
      if (java.lang.Long.bitCount(h64 ^ g64) <= 2)
        assert(pieces64(h64).intersect(pieces64(g64)).nonEmpty, s"64-bit miss: $h64 vs $g64")
    }
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
