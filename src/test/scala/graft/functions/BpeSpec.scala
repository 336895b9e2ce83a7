package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Round-17 (round-16 verdict #3): merge-order BPE tokenization. The pins
  * that matter:
  *   - BPE ≠ greedy longest-match on the SAME token inventory — the whole
  *     reason the budget family needed the merge-order walk;
  *   - merge ORDER alone changes the segmentation (same pair set,
  *     permuted ranks, different count);
  *   - leftmost-of-lowest-rank tie-breaking, word-boundary isolation, and
  *     kernel ≡ column-expression parity (interpreted and codegen'd).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def bpe(merges: (String, String)*): BpeMerges = new BpeMerges(merges.toArray)
  private def cnt(m: BpeMerges, s: String): Long = m.count(UTF8String.fromString(s))

  test("BPE count diverges from greedy longest-match on the same token inventory") {
    // merges produce tokens {ab, aa, bb}; greedy over that same vocab
    // segments "aabb" as [aa, bb] = 2, but merge order says (a,b) first:
    // [a, ab, b] — and no later merge applies: 3 tokens
    val m = bpe(("a", "b"), ("a", "a"), ("b", "b"))
    assert(cnt(m, "aabb") == 3L)
    val greedy = new SubwordVocab(Array("aa", "ab", "bb"))
    assert(greedy.count(UTF8String.fromString("aabb")) == 2L)
  }

  test("merge ORDER alone changes the count (same pair set, permuted ranks)") {
    val m1 = bpe(("a", "b"), ("a", "a"), ("b", "b"))
    val m2 = bpe(("a", "a"), ("b", "b"), ("a", "b"))
    // m2 merges aa first: [aa, b, b] -> (b,b): [aa, bb] = 2
    assert(cnt(m2, "aabb") == 2L)
    assert(cnt(m1, "aabb") == 3L)
  }

  test("leftmost occurrence of the lowest rank; composed (level-2) merges chain") {
    val m = bpe(("a", "b"), ("c", "d"), ("ab", "cd"))
    // ab at rank 0 merges first (leftmost), then cd, then the composed pair
    assert(cnt(m, "abcd") == 1L)
    assert(cnt(m, "abcdabcd") == 2L)
    // an unmergeable residue stays: "abcdx" -> [abcd, x]
    assert(cnt(m, "abcdx") == 2L)
  }

  test("words are isolated: merges never cross a space; empty words cost nothing") {
    val m = bpe(("a", "b"))
    assert(cnt(m, "a b") == 2L, "no merge across the boundary")
    assert(cnt(m, "ab ab") == 2L)
    assert(cnt(m, "  ab   ab  ") == 2L)
    assert(cnt(m, "x") == 1L)
  }

  test("column expression parity with the kernel (codegen'd reference object)") {
    val texts = Seq("aabb", "abcd abcd", "the merge order decides", "x", "a b ab")
    val m = Seq(("a", "b"), ("a", "a"), ("b", "b"), ("t", "h"), ("th", "e" + ""))
      .map { case (l, r) => (l, r) }
    val df = texts.toDF("text")
      .withColumn("n", TextFunctions.bpeTokens(col("text"), m))
    val kernel = new BpeMerges(m.toArray)
    val got = df.select("text", "n").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach { t =>
      assert(got(t) == kernel.count(UTF8String.fromString(t)),
        s"expression vs kernel mismatch on '$t'")
    }
  }

  test("byte-seeded (round 18): char- and byte-seeding diverge on multibyte text") {
    // empty table = no merges (round-17 advice): the count is the raw
    // alphabet length, which for the byte alphabet is UTF-8 byte count.
    // A char-seeded walk would say 2 for the CJK string and 5 for the
    // accented one; the byte walk is GPT-2's.
    val none = bpe()
    assert(cnt(none, "\u65e5\u672c") == 6L, "CJK: 2 chars, 6 UTF-8 bytes")
    assert(cnt(none, "h\u00e9llo") == 6L, "é is 2 bytes")
    assert(cnt(none, "\ud834\udd1e") == 4L,
      "astral char: 4 UTF-8 bytes (a UTF-16-unit walk would see 2 lone surrogates)")
    assert(cnt(none, "ascii") == 5L)
    // merges address BYTES via their latin-1 bridge chars: merging the two
    // UTF-8 bytes of é (0xC3, 0xA9) fuses it back into one token
    val eAcc = bpe(("\u00c3", "\u00a9"))
    assert(cnt(eAcc, "h\u00e9llo") == 5L)
  }

  test("encode emits GPT-2-style ids: raw bytes 0-255, merge k = 256+k, word order") {
    def ids(m: BpeMerges, s: String): Seq[Int] = {
      val a = m.encode(UTF8String.fromString(s))
      (0 until a.numElements()).map(a.getInt)
    }
    val m = bpe(("a", "b"), ("c", "d"), ("ab", "cd"))
    assert(ids(m, "abcd") == Seq(258), "fully merged word = the level-2 id")
    assert(ids(m, "abx cd") == Seq(256, 'x'.toInt, 257))
    assert(ids(bpe(), "hi") == Seq('h'.toInt, 'i'.toInt))
    // multibyte raw bytes surface as their byte values
    assert(ids(bpe(), "h\u00e9") == Seq('h'.toInt, 0xC3, 0xA9))
    // count ≡ encode length on every case
    Seq("abcd", "abx cd", "hi", "h\u00e9", "  ab  ").foreach { t =>
      assert(ids(m, t).length.toLong == cnt(m, t), s"count vs encode length on '$t'")
    }
  }

  test("expression parity: bpeEncode column = kernel.encode (codegen'd)") {
    val texts = Seq("abcd", "abx cd", "the merge", "", " a ")
    val m = Seq(("a", "b"), ("c", "d"), ("ab", "cd"))
    val df = texts.toDF("text")
      .withColumn("ids", TextFunctions.bpeEncode(col("text"), m))
    val kernel = new BpeMerges(m.toArray)
    val got = df.collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    texts.foreach { t =>
      val a = kernel.encode(UTF8String.fromString(t))
      val want = (0 until a.numElements()).map(a.getInt)
      assert(got(t) == want, s"expression vs kernel mismatch on '$t'")
    }
  }

  test("corpus-derived merges: ranks are a total order and the faces agree with a hand walk") {
    val d = sf()
    val merges = graft.operators.TextOps.corpusBpeMerges(spark, d)
    assert(merges.nonEmpty && merges.length <=
      graft.operators.TextOps.bpeLevel1 + graft.operators.TextOps.bpeLevel2)
    // level-1 merges are single chars; level-2 halves are level-1 tokens
    val l1 = merges.filter { case (l, r) => l.length == 1 && r.length == 1 }
    val l2 = merges.filter { case (l, r) => l.length == 2 && r.length == 2 }
    assert(l1.length + l2.length == merges.length)
    val l1toks = l1.map { case (l, r) => l + r }.toSet
    l2.foreach { case (l, r) =>
      assert(l1toks.contains(l) && l1toks.contains(r),
        s"level-2 merge ($l,$r) must compose level-1 tokens")
    }
    // the face's n_bpe for one doc equals the kernel applied per word
    val kernel = new BpeMerges(merges)
    val row = graft.operators.TextOps.bpeTokenStats(spark, d)
      .orderBy("doc_id").limit(1).collect().head
    val text = graft.core.Tables.documents(spark, d)
      .where(col("doc_id") === row.getLong(0)).head.getAs[String]("text")
    assert(row.getLong(2) == kernel.count(UTF8String.fromString(text)))
  }
}
