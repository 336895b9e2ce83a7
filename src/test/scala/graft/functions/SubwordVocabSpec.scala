package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-16: the subword tokenizer's vocab is a PARAMETER. Pins:
  *   - greedy longest-match semantics under a custom vocab (hand cases);
  *   - the parameterized kernel with the frozen vocab ≡ the default path
  *     (bit-identical counts — parameterization changed no behavior);
  *   - a 10,000-entry vocab keeps per-position resolution
  *     O(candidates per first char): counting a ~1 MB corpus completes in
  *     the same order as the 62-entry vocab (the longest-first per-char
  *     dispatch is the contract, not a full-vocab scan per position);
  *   - corpus-vocab derivation is deterministic and correctly sized.
  */
class SubwordVocabSpec extends SparkSpec {
  import spark.implicits._

  private def count(vocab: Seq[String], text: String): Long =
    new SubwordVocab(vocab.toArray)
      .count(org.apache.spark.unsafe.types.UTF8String.fromString(text))

  test("greedy longest-match under a custom vocab") {
    // "abcb" -> abc + b (longest first), "ab" -> ab
    assert(count(Seq("ab", "abc", "b"), "abcb ab") == 3L)
    // no match -> one unknown token per char
    assert(count(Seq("xy"), "abc") == 3L)
    // spaces never count and never match
    assert(count(Seq("ab"), "  ab  ab ") == 2L)
    // a vocab entry longer than the remaining word can't match
    assert(count(Seq("abcd"), "abc") == 3L)
  }

  test("vocab entries must be space-free, non-empty, ASCII") {
    intercept[IllegalArgumentException](new SubwordVocab(Array("a b")))
    intercept[IllegalArgumentException](new SubwordVocab(Array("")))
    intercept[IllegalArgumentException](new SubwordVocab(Array("éx")))
    intercept[IllegalArgumentException](new SubwordVocab(Array("xé")))
  }

  test("parameterized kernel with the frozen vocab equals the default path") {
    val docs = graft.core.Tables.documents(spark, sf())
    val diff = docs.select(
        TextFunctions.subwordTokens(col("text")).as("dflt"),
        TextFunctions.subwordTokens(col("text"), SubwordKernel.vocab.toSeq).as("param"))
      .where(col("dflt") =!= col("param")).count()
    assert(diff == 0L)
  }

  test("10k-entry vocab: per-position dispatch stays cheap") {
    // deterministic 10k vocab spread over 26 first letters, lengths 2..8
    val rnd = new scala.util.Random(7)
    val vocab10k = (0 until 10000).map { _ =>
      val len = 2 + rnd.nextInt(7)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }.distinct
    assert(vocab10k.size > 9000)
    val text = {
      val r2 = new scala.util.Random(13)
      (0 until 150000).map { _ =>
        (0 until (3 + r2.nextInt(8))).map(_ => ('a' + r2.nextInt(26)).toChar).mkString
      }.mkString(" ") // ~1 MB
    }
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(text)
    val small = SubwordKernel.default
    val big = new SubwordVocab(vocab10k.toArray)
    def time(v: SubwordVocab): (Long, Double) = {
      v.count(u) // warm
      val samples = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); v.count(u); (System.nanoTime() - t0) / 1e9
      }
      (v.count(u), samples.min)
    }
    val (cSmall, tSmall) = time(small)
    val (cBig, tBig) = time(big)
    assert(cSmall > 0 && cBig > 0 && cBig <= cSmall,
      "a larger vocab can only merge more characters per token")
    // two-level (c0, c1) dispatch: ~15 candidates/bucket at 10k entries —
    // the 10k count must stay within one small multiple of the 62-entry
    // run (a naive full-vocab scan per position would be ~3 orders off)
    assert(tBig < math.max(0.5, tSmall * 20),
      f"10k-vocab count took $tBig%.2fs vs $tSmall%.2fs for the 62-entry vocab")
  }

  test("corpus vocab: deterministic, sized, and consumed by the kernel") {
    val v1 = graft.operators.TextOps.corpusSubwordVocab(spark, sf())
    // sized to the corpus: min(cap, distinct grams) — sf0.001's synthetic
    // vocabulary has ~200 distinct 2-4-grams, under the 512 cap
    assert(v1.length <= graft.operators.TextOps.corpusVocabSize && v1.length > 100)
    assert(v1.distinct.length == v1.length)
    assert(v1.forall(g => g.length >= 2 && g.length <= 4 && !g.contains(' ')))
    // consuming it end to end: counts are positive and <= char count
    val stats = graft.operators.TextOps.subwordVocabTokenStats(spark, sf())
    assert(stats.where(col("n_subword") <= 0L).count() == 0L)
  }
}
