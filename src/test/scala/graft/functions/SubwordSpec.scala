package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword kernel: hand-computed counts, the
  * greedy-vs-shorter-match discipline, the unknown-character fallback,
  * whitespace handling, vocab invariants, and Expression/kernel parity
  * through the registered SQL function.
  */
class SubwordSpec extends SparkSpec {

  private def count(s: String): Long =
    SubwordKernel.subwordCount(UTF8String.fromString(s))

  test("vocab invariants: no spaces, no single letters, all lowercase ASCII") {
    SubwordKernel.vocab.foreach { v =>
      assert(v.length >= 2, s"'$v' must not be a single letter")
      assert(!v.contains(' '), s"'$v' must not contain a space")
      assert(v.forall(c => c >= 'a' && c <= 'z'), s"'$v' must be lowercase ascii")
    }
    assert(SubwordKernel.vocab.distinct.length == SubwordKernel.vocab.length)
  }

  test("hand-computed counts") {
    // "the" is a vocab entry: one token
    assert(count("the") == 1L)
    // "thering" = "ther"(4, longest at pos 0 beats "th"/"the") + "ing"(3)
    assert(count("thering") == 2L)
    // "xyz" — x,y,z all unknown first chars: 3 single-char tokens
    assert(count("xyz") == 3L)
    // "coding" = "co" + "de"? no: c-o-d-i-n-g → "co"(2) + 'd'(1) + "ing"(3)
    assert(count("coding") == 3L)
    // whitespace is never a token; multiple spaces collapse to nothing
    assert(count("the  the") == 2L)
    assert(count("") == 0L)
    assert(count("   ") == 0L)
  }

  test("greedy longest-match: a longer vocab entry always wins at its position") {
    // at pos 0 of "tion...", the 4-char "tion" must win over "ti"/"it"/"io"
    assert(count("tion") == 1L)
    // "mention" = "ment"(4, beats "me") + "ion"(3) = 2 — if the matcher
    // took the shorter "me" first it would need 3 ("me"+'n'+"tion")
    assert(count("mention") == 2L)
  }

  test("unknown characters each count one token (the CJK honesty property)") {
    // non-ASCII BMP chars: one token per character
    assert(count("世界") == 2L)
    assert(count("ab世cd") == count("ab") + 1L + count("cd"))
  }

  test("Expression ≡ kernel through the registered SQL function, and counts bound the whitespace count") {
    graft.functions.TextFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, sf())
      .select(col("doc_id"), col("text")).limit(50)
    val viaExpr = docs.select(col("doc_id"),
      TextFunctions.subwordTokens(col("text")).as("a"))
    val viaSql = docs.selectExpr("doc_id", "subword_tokens(text) AS b")
    assert(viaExpr.join(viaSql, "doc_id").where(col("a") =!= col("b")).count() == 0)
    // a subword count is never below the non-empty whitespace token count
    // (every word is >= 1 subword token)
    val words = docs.select(col("doc_id"),
      size(filter(split(col("text"), " "), w => length(w) > 0)).cast("long").as("nw"),
      TextFunctions.subwordTokens(col("text")).as("ns"))
    assert(words.where(col("ns") < col("nw")).count() == 0)
  }
}
