package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit}

/** Round-18 optimization: the LSH sweep faces (`dedup_lsh_tuning`,
  * `dedup_lsh_recall`) now compute ONE signature frame at the max sweep
  * width and derive every narrower width by column projection
  * ([[Dedup.sigPrefixK]]) instead of paying one shingle pass per distinct
  * k. That rewrite is only legal because component j of a minhash
  * signature depends on j alone (shared (mixA, mixB) family), so the
  * first k columns of a wider signature ARE the k-wide signature. This
  * spec pins the identity bit-for-bit on a mixed corpus (including
  * empty/shingle-less docs — the emptiness filter must also be
  * k-independent), plus the fused left-join count the recall face now
  * uses in place of count + left-semi count.
  */
class SignaturePrefixSpec extends SparkSpec {

  private lazy val docs: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val real = (0L until 120L).map { i =>
      (i, (0 until 12).map(_ => s"w${rnd.nextInt(150)}").mkString(" "))
    }
    // near-dup pair + shingle-less shorties (under 3 tokens -> no 3-grams)
    val edge = Seq((500L, real(3)._2 + " tail"), (501L, "one two"), (502L, ""))
    (real ++ edge).toDF("doc_id", "text")
  }

  test("signaturesOfK(k) ≡ first-k projection of signaturesOfK(kMax), bit for bit") {
    for (k <- Seq(6, 12)) {
      val direct = Dedup.signaturesOfK(docs, k)
      val projected = Dedup.sigPrefixK(Dedup.signaturesOfK(docs, 64), k)
      assert(direct.columns.toSeq == projected.columns.toSeq)
      assert(direct.exceptAll(projected).isEmpty && projected.exceptAll(direct).isEmpty,
        s"k=$k projection diverged from the direct signature")
    }
  }

  test("fused left-join (n_candidates, found) ≡ count + left-semi count") {
    val sig = Dedup.signaturesOfK(docs, 64).localCheckpoint()
    val cands = Dedup.bandedPairsAdaptive(Dedup.sigPrefixK(sig, 6),
      Dedup.bandsOfK(_, 3, 2), Seq("band", "bkey")).localCheckpoint()
    val truth = Dedup.bandedPairsAdaptive(Dedup.sigPrefixK(sig, 12),
      Dedup.bandsOfK(_, 4, 3), Seq("band", "bkey")).localCheckpoint()
    val r = cands.join(truth.withColumn("hit", lit(1)), Seq("doc_a", "doc_b"), "left")
      .agg(count(lit(1)).as("nc"), count(col("hit")).as("nf")).head()
    assert(r.getLong(0) == cands.count())
    assert(r.getLong(1) == cands.join(truth, Seq("doc_a", "doc_b"), "left_semi").count())
  }
}
