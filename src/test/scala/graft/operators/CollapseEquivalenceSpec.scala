package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Round-12: the exact-set collapse extended beyond the exact Jaccard join
  * to the other candidate paths (round-11 verdict #1). Candidate-ness in
  * every one of these paths is a function of CONTENT-DERIVED state alone
  * (MinHash signature vector / SimHash value), so running the kernel on one
  * representative per distinct signature and reconstructing doc-level
  * pairs through membership joins must be PAIR-FOR-PAIR identical to the
  * flat kernel — this spec pins that on a clique-shaped fixture that
  * drives the ADAPTIVE entry into the collapse branch (maxGroup above
  * bucketExpandCap, dup mass far above the HLL pre-gate), plus the forced
  * body on a small below-threshold fixture, plus the flat branch on a
  * clean corpus.
  */
class CollapseEquivalenceSpec extends SparkSpec {

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def pairMap(df: DataFrame): Map[(Long, Long), Int] =
    df.select("doc_a", "doc_b", "hamming").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap

  /** 300-copy boilerplate clique (past bucketExpandCap = 256) + a 40-copy
    * near-dup group of the same page + distinct background docs — the
    * web-crawl pathology, small enough for an in-test flat reference.
    */
  private lazy val cliqueDocs: DataFrame = {
    import spark.implicits._
    val page = "the quick brown fox jumps over the lazy dog again and again"
    val near = "the quick brown fox jumps over the lazy dog again and AGAIN"
    val rnd = new scala.util.Random(1212)
    val background = (0 until 60).map { i =>
      (1000L + i, (0 until 8).map(_ => s"w${rnd.nextInt(400)}").mkString(" "))
    }
    ((0L until 300L).map(i => (i, page)) ++
      (500L until 540L).map(i => (i, near)) ++ background)
      .toDF("doc_id", "text")
  }

  private lazy val cleanDocs: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    (0L until 80L).map { i =>
      (i, (0 until 10).map(_ => s"t${rnd.nextInt(300)}").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("MinHash banding: adaptive (collapse branch on the clique fixture) ≡ flat kernel") {
    val sig = Dedup.signaturesOf(cliqueDocs).localCheckpoint()
    val flat = pairSet(Dedup.pairsFromBucketedRows(
      Dedup.bandsOf(sig), Seq("band", "h1", "h2"), Dedup.bucketExpandCap))
    val adaptive = pairSet(Dedup.bandedPairsAdaptive(sig, Dedup.bandsOf, Seq("band", "h1", "h2")))
    // fixture sanity: the clique's pairs dominate, so the collapse branch fired
    assert(flat.size >= 300 * 299 / 2, s"fixture lost its clique: ${flat.size} pairs")
    assert(adaptive == flat,
      s"collapse diverges: extra=${(adaptive -- flat).take(5)} missing=${(flat -- adaptive).take(5)}")
  }

  test("MinHash banding: forced collapse body ≡ flat on a below-threshold fixture") {
    val sig = Dedup.signaturesOf(cleanDocs).localCheckpoint()
    val flat = pairSet(Dedup.pairsFromBucketedRows(
      Dedup.bandsOf(sig), Seq("band", "h1", "h2"), Dedup.bucketExpandCap))
    val forced = pairSet(Dedup.bandedPairsCollapsedBody(sig, Dedup.bandsOf, Seq("band", "h1", "h2")))
    assert(forced == flat,
      s"forced collapse diverges on clean corpus: extra=${(forced -- flat).take(5)} " +
        s"missing=${(flat -- forced).take(5)}")
  }

  test("MinHash banding at (k=12, 4, 3): adaptive ≡ flat on the clique fixture") {
    val sig = Dedup.signaturesOfK(cliqueDocs, 12).localCheckpoint()
    val flat = pairSet(Dedup.pairsFromBucketedRows(
      Dedup.bandsOfK(sig, 4, 3), Seq("band", "bkey"), Dedup.bucketExpandCap))
    val adaptive = pairSet(
      Dedup.bandedPairsAdaptive(sig, Dedup.bandsOfK(_, 4, 3), Seq("band", "bkey")))
    assert(adaptive == flat)
  }

  test("SimHash (64-bit): adaptive (collapse branch) ≡ flat, hamming carried verbatim") {
    val sig = cliqueDocs
      .select(col("doc_id"), graft.functions.TextFunctions.simhash64(col("text")).as("simhash"))
      .localCheckpoint()
    val flat = pairMap(Dedup.simhashNearDupPairsFlat(sig, 64))
    val adaptive = pairMap(Dedup.simhashNearDupPairsWith(sig, 64))
    assert(flat.count(_._2 == 0) >= 300 * 299 / 2, "fixture lost its hamming-0 clique")
    assert(adaptive == flat,
      s"simhash collapse diverges: extra=${(adaptive.keySet -- flat.keySet).take(5)} " +
        s"missing=${(flat.keySet -- adaptive.keySet).take(5)}")
  }

  test("SimHash: forced collapse body ≡ flat on a below-threshold fixture") {
    val sig = cleanDocs
      .select(col("doc_id"), graft.functions.TextFunctions.simhash64(col("text")).as("simhash"))
      .localCheckpoint()
    assert(pairMap(Dedup.simhashPairsCollapsed(sig, 64)) ==
      pairMap(Dedup.simhashNearDupPairsFlat(sig, 64)))
  }

  private def shFrame(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), graft.functions.TextFunctions.shingleHashes(col("text")).as("sh"))
    .where(org.apache.spark.sql.functions.size(col("sh")) > 0)
    .localCheckpoint()

  private def contMap(df: DataFrame): Map[(Long, Long), (Long, Long)] =
    df.select("doc_a", "doc_b", "inter", "n_min").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap

  test("containment join: adaptive (collapse branch on the clique fixture) ≡ flat") {
    val docs = shFrame(cliqueDocs)
    val flat = contMap(Dedup.containmentJoinFlat(docs))
    val adaptive = contMap(Dedup.containmentJoinOf(docs))
    assert(flat.count(_._2 match { case (i, m) => i == m }) >= 300 * 299 / 2,
      "fixture lost its containment-1 clique")
    assert(adaptive == flat,
      s"containment collapse diverges: extra=${(adaptive.keySet -- flat.keySet).take(5)} " +
        s"missing=${(flat.keySet -- adaptive.keySet).take(5)}")
  }

  test("containment join: forced collapse body ≡ flat on a below-threshold fixture") {
    val docs = shFrame(cleanDocs)
    assert(contMap(Dedup.containmentJoinCollapsed(docs)) ==
      contMap(Dedup.containmentJoinFlat(docs)))
  }

  test("delta banding: adaptive (collapse branch) ≡ flat, delta-touching contract kept") {
    val bands = Dedup.bandRowsOf(cliqueDocs).localCheckpoint()
    val cutoff = 250L // splits the 300-clique: 250 old copies, 50 new + the near group
    val flat = pairSet(Dedup.deltaCandidatesFromBandsFlat(bands, cutoff))
    val adaptive = pairSet(Dedup.deltaCandidatesFromBands(bands, cutoff))
    assert(flat.nonEmpty && flat.forall { case (a, b) => a > cutoff || b > cutoff })
    // the old-old clique half must NOT appear (delta discipline): 250 old
    // copies pair with the 50 new ones but never with each other
    assert(!flat.exists { case (a, b) => a <= cutoff && b <= cutoff })
    assert(adaptive == flat,
      s"delta collapse diverges: extra=${(adaptive -- flat).take(5)} " +
        s"missing=${(flat -- adaptive).take(5)}")
  }

  test("exact Jaccard join: fingerprint-keyed adaptive entry ≡ flat on the clique fixture") {
    val docs = shFrame(cliqueDocs)
    val flatPairs = Dedup.exactJoinProbeCandidates(docs) // candidates, then compare joins
    assert(flatPairs.count() > 0)
    val adaptive = contMapJ(Dedup.exactJaccardJoinOf(docs))
    val forced = contMapJ(Dedup.exactJaccardJoinCollapsed(docs))
    assert(adaptive == forced,
      s"adaptive (collapse fires on this fixture) != forced collapse: " +
        s"${(adaptive.keySet -- forced.keySet).take(5)} / ${(forced.keySet -- adaptive.keySet).take(5)}")
    assert(adaptive.count(_._2 == 1.0) >= 300 * 299 / 2, "clique pairs missing")
  }

  private def contMapJ(df: DataFrame): Map[(Long, Long), Double] =
    df.select("doc_a", "doc_b", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

  test("pre-gate: clean corpus skips stats (flat), dup-heavy corpus does not") {
    import org.apache.spark.sql.functions.xxhash64
    val cleanSig = Dedup.signaturesOf(cleanDocs).localCheckpoint()
    assert(Dedup.lowDupPreGate(cleanSig,
      xxhash64(cleanSig.columns.filter(_ != "doc_id").map(col): _*)))
    val dupSig = Dedup.signaturesOf(cliqueDocs).localCheckpoint()
    assert(!Dedup.lowDupPreGate(dupSig,
      xxhash64(dupSig.columns.filter(_ != "doc_id").map(col): _*)))
    // empty frame: gate says flat instead of throwing
    assert(Dedup.lowDupPreGate(cleanSig.where(col("doc_id") < 0),
      xxhash64(col("doc_id"))))
  }
}
