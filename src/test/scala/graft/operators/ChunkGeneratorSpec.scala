package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The chunk UDTF and the DataFrame chunker must compute the identical
  * window set on ANY input — the corpus oracle proves it on real docs;
  * this spec pins the adversarial edges (empty string, lone token,
  * repeated spaces, exact window-boundary lengths) plus 200 seeded-random
  * texts. A divergence here would mean SQL and DataFrame users chunk the
  * same corpus differently — the silent-inconsistency class the shared
  * oracle exists to prevent.
  */
class ChunkGeneratorSpec extends SparkSpec {
  import spark.implicits._

  private val W = TextOps.chunkWindowTokens
  private val S = TextOps.chunkStrideTokens

  test("UDTF ≡ DataFrame chunker on edge cases and seeded-random texts") {
    val rng = new scala.util.Random(20260815L)
    val alphabet = Vector("a", "bb", "ccc", "dddd", "", "tok")
    val rand = (0 until 200).map { i =>
      val n = rng.nextInt(3 * W)
      (1000L + i, (0 until n).map(_ => alphabet(rng.nextInt(alphabet.size))).mkString(" "))
    }
    val edges = Seq(
      (0L, ""), (1L, "a"), (2L, "a b"), (3L, "  "), (4L, "a  b   c"),
      (5L, (1 to W).map(_.toString).mkString(" ")),        // exactly one window
      (6L, (1 to W + 1).map(_.toString).mkString(" ")),    // tail window of 1 past stride? no: W+1 tokens → 2 windows
      (7L, (1 to S).map(_.toString).mkString(" ")),
      (8L, (1 to 2 * W).map(_.toString).mkString(" ")))
    val docs = (edges ++ rand).toDF("doc_id", "text")
    docs.createOrReplaceTempView("chunk_prop_docs")
    graft.functions.TextFunctions.register(spark)

    val viaUdtf = spark.sql(
      s"""SELECT doc_id, win_id, win_tokens, chunk FROM chunk_prop_docs
         |LATERAL VIEW graft_chunks(text, $W, $S) t AS win_id, win_tokens, chunk""".stripMargin)
    val viaDf = TextOps.chunkWindowsOf(docs)

    val a = viaUdtf.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    val b = viaDf.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(a == b, s"UDTF vs DataFrame diverge: onlyUdtf=${(a -- b).take(3)} " +
      s"onlyDf=${(b -- a).take(3)}")
    assert(a.nonEmpty)
    // the W+1-token doc must have exactly 2 windows, the second a short tail
    val d6 = a.filter(_._1 == 6L).toSeq.sortBy(_._2)
    assert(d6.map(_._3) == Seq(W, W + 1 - S), s"boundary windows wrong: $d6")
  }
}
