package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines: exact
  * (hash-groupBy), MinHash + LSH banding (shingle → signature → band →
  * bucket self-join), SimHash, and n-gram Jaccard verification.
  *
  * Scale design: exact dedup is one shuffle on the content hash; MinHash
  * signatures are map-only; LSH banding turns the quadratic all-pairs
  * problem into a self-join on (band, band-hash) buckets — the shuffle key
  * is the bucket, so candidate generation is linear in bucket occupancy,
  * never |docs|². Jaccard runs only on LSH candidates.
  *
  * Hashing uses md5-derived 60-bit integers (first 15 hex chars) because
  * md5 is identically defined in every engine — signatures are therefore
  * reproducible by the DuckDB oracle bit-for-bit.
  */
object Dedup {

  /** Word 3-gram shingles of `toks` (docs with <3 tokens get none). */
  private val shingleExpr =
    """CASE WHEN size(toks) >= 3
      |     THEN transform(sequence(0, size(toks) - 3),
      |                    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
      |     ELSE array() END""".stripMargin

  private val shingleSqlExpr =
    """CASE WHEN len(toks) >= 3
      |     THEN list_transform(range(1, len(toks) - 1),
      |                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |     ELSE [] END""".stripMargin

  /** 60-bit hash of a string expression `e` salted with `j` (Spark side). */
  private def h(e: String, j: Int): String =
    s"CAST(conv(substr(md5(concat($e, '|$j')), 1, 15), 16, 10) AS BIGINT)"

  /** Same hash, DuckDB side. */
  private def hSql(e: String, j: Int): String =
    s"(('0x' || substr(md5($e || '|$j'), 1, 15))::BIGINT)"

  val numHashes = 6

  /** Exact dedup: group by content hash, keep the lowest doc_id per group
    * (the canonical survivor), count members. One shuffle on md5(text).
    */
  def exactDedup(s: SparkSession, d: String): DataFrame =
    exactDedupOf(Tables.documents(s, d))

  private[graft] def exactDedupOf(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_members"))

  val exactDedupSql: String =
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_members
      |FROM documents GROUP BY md5(text)""".stripMargin

  /** Exact dedup on NORMALIZED content: lowercase, strip non-alphanumerics,
    * collapse runs of spaces — the canonicalization pass that catches the
    * near-trivial duplicates byte-exact dedup misses (case drift, punct
    * variants, double spaces: the most common duplicate class in scraped
    * corpora). Same one-shuffle shape as [[exactDedup]]; the regex chain
    * is map-side and ASCII-safe in both engines.
    */
  def normalizedDedup(s: SparkSession, d: String): DataFrame =
    normalizedDedupOf(Tables.documents(s, d))

  private[graft] def normalizedDedupOf(docs: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    docs
      .groupBy(md5(norm).as("norm_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_members"))
  }

  val normalizedDedupSql: String =
    """SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_hash,
      | MIN(doc_id) AS keep_id, COUNT(*) AS n_members
      |FROM documents
      |GROUP BY 1""".stripMargin

  /** Cross-document repeated n-gram spans: word-3-grams appearing in ≥
    * `sharedNgramMinDocs` DISTINCT documents, ranked by document count —
    * the memorization-risk audit (Rae et al.'s repeated-span analysis):
    * a span shared across many training documents is the span a model
    * will most readily regurgitate, and boilerplate/template spans
    * surface here before they skew training. Scale shape: per-doc
    * distinct shingle explode (≈ token stream) → one hash shuffle on the
    * shingle → count; the ≥-threshold keeps the result set sized to the
    * repeated tail, and TakeOrderedAndProject merges the top rows (string
    * tie-break — byte-identical across engines on this ASCII corpus).
    */
  val sharedNgramMinDocs = 3
  val sharedNgramTopK = 20

  def sharedNgrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(s"array_distinct($shingleExpr)")).as("shingle"))
      .groupBy("shingle")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .where(col("n_docs") >= sharedNgramMinDocs)
      .orderBy(col("n_docs").desc, col("shingle"))
      .limit(sharedNgramTopK)

  val sharedNgramsSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       | sh AS (SELECT doc_id, unnest(list_distinct($shingleSqlExpr)) AS shingle FROM t)
       |SELECT shingle, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
       |FROM sh GROUP BY shingle HAVING COUNT(*) >= $sharedNgramMinDocs
       |ORDER BY n_docs DESC, shingle LIMIT $sharedNgramTopK""".stripMargin

  /** Cross-document repeated CHARACTER spans via a true rolling hash —
    * the exact-substring dedup scan (the Rabin–Karp formulation of the
    * "repeated ≥N-char span" pass from the deduplicating-training-data
    * line of work): every [[repeatedSpanStride]]-th length-
    * [[repeatedSpanWindow]] char window is hashed by the O(1)-per-
    * character [[graft.functions.RollingHashes]] kernel, one shuffle
    * groups windows by hash, and spans seen in ≥ [[repeatedSpanMinDocs]]
    * DISTINCT documents surface, ranked. Character-level spans catch
    * cross-token-boundary and sub-token repeats the word-3-gram audit
    * ([[sharedNgrams]]) structurally cannot; the stride trades positions
    * scanned for a detection floor of window + stride − 1 repeated chars.
    * Scale shape: the scan is map-only (one multiply-add per character —
    * the rolling property, not a per-window O(k) rehash), the single
    * shuffle is corpus-character-sized / stride with map-side partial
    * aggregation, and the result is TakeOrderedAndProject-merged. The
    * oracle replays the identical polynomial fold per window in SQL
    * (O(k) there — the oracle buys clarity, the kernel buys speed; the
    * values are bit-equal in exact int64).
    */
  val repeatedSpanWindow = 40
  val repeatedSpanStride = 4
  val repeatedSpanMinDocs = 2
  val repeatedSpanTopK = 20

  def repeatedSubstrings(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(graft.functions.TextFunctions
        .rollingHashes(col("text"), repeatedSpanWindow, repeatedSpanStride)).as("gram_hash"))
      .groupBy("gram_hash")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("first_doc"))
      .where(col("n_docs") >= repeatedSpanMinDocs)
      .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("gram_hash"))
      .limit(repeatedSpanTopK)

  lazy val repeatedSubstringsSql: String = {
    val M = graft.functions.ShingleKernel.RollM
    val B = graft.functions.ShingleKernel.RollB
    s"""WITH pos AS (
       |  SELECT doc_id, text,
       |    unnest(range(1, len(text) - $repeatedSpanWindow + 2, $repeatedSpanStride)) AS i
       |  FROM documents WHERE len(text) >= $repeatedSpanWindow),
       | grams AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(i, i + $repeatedSpanWindow),
       |                     j -> CAST(ord(text[j]) % 128 AS BIGINT))),
       |      (acc, c) -> (acc * $B + c) % $M) AS gram_hash
       |  FROM pos)
       |SELECT gram_hash, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences,
       |  MIN(doc_id) AS first_doc
       |FROM grams GROUP BY gram_hash HAVING COUNT(DISTINCT doc_id) >= $repeatedSpanMinDocs
       |ORDER BY n_docs DESC, n_occurrences DESC, gram_hash LIMIT $repeatedSpanTopK""".stripMargin
  }

  /** Span-level SCRUB verdicts — [[repeatedSubstrings]] finds the repeated
    * character spans; this face prices each DOCUMENT by them and decides
    * the removal: per doc, how many of its scanned windows are non-first
    * occurrences of a cross-document span (the canonical copy — the one in
    * the span's min-doc_id document — is never charged), the integer
    * permille of duplicated coverage, and the keep verdict at
    * [[spanScrubMaxPermille]]. This is the document-granular face of
    * exact-substring dedup (Lee et al. 2021's remove-the-duplicated-span
    * policy, applied at doc granularity): a doc that is mostly spans
    * already present earlier in the corpus is boilerplate / template bulk
    * and gets dropped even when no WHOLE-doc near-dup face fires.
    *
    * Scale shape: the window stream is the same map-only rolling-hash
    * scan as [[repeatedSubstrings]] (O(1)/char); spans shared by ≥2 docs
    * come from one hash-keyed agg; charging occurrences back is a second
    * hash-partitioned join on gram_hash (both sides co-partitioned by the
    * agg's own exchange — AQE reuses it) followed by a doc_id agg. Docs
    * too short to produce a window re-enter via one left join from the
    * doc table, charged zero. No driver collect, no global sort.
    */
  val spanScrubMaxPermille = 500L

  def spanScrub(s: SparkSession, d: String): DataFrame =
    spanScrubOf(Tables.documents(s, d))

  private[operators] def spanScrubOf(docs: DataFrame): DataFrame = {
    val grams = docs
      .select(col("doc_id"), explode(graft.functions.TextFunctions
        .rollingHashes(col("text"), repeatedSpanWindow, repeatedSpanStride)).as("gram_hash"))
    val shared = grams
      .groupBy("gram_hash")
      .agg(countDistinct(col("doc_id")).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .where(col("n_docs") >= repeatedSpanMinDocs)
      .select(col("gram_hash"), col("first_doc"))
    val charged = grams
      .join(shared, Seq("gram_hash"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("first_doc").isNotNull && col("first_doc") < col("doc_id"), 1L)
          .otherwise(0L)).as("n_dup_windows"))
    docs.select("doc_id")
      .join(charged, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("dup_permille",
        expr("CASE WHEN n_windows = 0 THEN 0 ELSE 1000 * n_dup_windows DIV n_windows END"))
      .withColumn("keep", col("dup_permille") < spanScrubMaxPermille)
  }

  lazy val spanScrubSql: String = {
    val M = graft.functions.ShingleKernel.RollM
    val B = graft.functions.ShingleKernel.RollB
    s"""WITH pos AS (
       |  SELECT doc_id, text,
       |    unnest(range(1, len(text) - $repeatedSpanWindow + 2, $repeatedSpanStride)) AS i
       |  FROM documents WHERE len(text) >= $repeatedSpanWindow),
       | grams AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(i, i + $repeatedSpanWindow),
       |                     j -> CAST(ord(text[j]) % 128 AS BIGINT))),
       |      (acc, c) -> (acc * $B + c) % $M) AS gram_hash
       |  FROM pos),
       | shared AS (
       |  SELECT gram_hash, MIN(doc_id) AS first_doc
       |  FROM grams GROUP BY gram_hash
       |  HAVING COUNT(DISTINCT doc_id) >= $repeatedSpanMinDocs),
       | charged AS (
       |  SELECT g.doc_id, COUNT(*) AS n_windows,
       |    CAST(SUM(CASE WHEN sh.first_doc IS NOT NULL AND sh.first_doc < g.doc_id
       |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows
       |  FROM grams g LEFT JOIN shared sh USING (gram_hash)
       |  GROUP BY g.doc_id)
       |SELECT d.doc_id,
       |  COALESCE(c.n_windows, 0) AS n_windows,
       |  COALESCE(c.n_dup_windows, 0) AS n_dup_windows,
       |  CASE WHEN COALESCE(c.n_windows, 0) = 0 THEN 0
       |       ELSE 1000 * c.n_dup_windows // c.n_windows END AS dup_permille,
       |  (CASE WHEN COALESCE(c.n_windows, 0) = 0 THEN 0
       |        ELSE 1000 * c.n_dup_windows // c.n_windows END) < $spanScrubMaxPermille AS keep
       |FROM documents d LEFT JOIN charged c USING (doc_id)""".stripMargin
  }

  /** Universal-hash family for MinHash: one 52-bit md5-derived base hash per
    * shingle, then k cheap linear mixes (base·A_j + B_j mod p). One
    * cryptographic hash instead of k — the standard MinHash construction,
    * and ~k× less hashing work per shingle at scale. The base is reduced
    * mod p BEFORE mixing (identical values by modular arithmetic, and both
    * engines' kernels state it the same way), so every product stays in
    * exact int64 at ANY signature width — production MinHash runs
    * k = 64-128, and the unreduced 52-bit base overflowed 2⁶³ from j = 20.
    */
  private val mixP = 1000000007L
  private def mixA(j: Int): Long = 37L + 101L * j
  private def mixB(j: Int): Long = 1009L * j

  /** MinHash signatures: per doc, min over word-3-gram shingles of k mixed
    * hashes. Map-only (aggregate/transform fold inside codegen).
    */
  def minhashSignatures(s: SparkSession, d: String): DataFrame =
    signaturesOf(Tables.documents(s, d))

  /** Signature stage over any (doc_id, text) frame — shared by the
    * query-time pipeline and the persisted [[LshIndex]].
    */
  private[operators] def signaturesOf(docs: DataFrame): DataFrame =
    signaturesOfK(docs, numHashes)

  /** Signatures at an ARBITRARY k — the MinHash family is parameterized
    * over (k, bands, rowsPerBand), not shape-locked to the k = 6
    * production default: production-scale dedup runs k = 64-128, and the
    * `dedup_lsh_candidates_k12` + `dedup_lsh_candidates_k64` faces + the
    * tuning sweep exercise further configs end-to-end. The base hash is
    * reduced mod p before the (37 + 101j) mixes — identical values, but
    * exact int64 at ANY width (see [[graft.functions.ShingleKernel.minhash]]);
    * the kernel's require enforces the documented bound.
    */
  private[operators] def signaturesOfK(docs: DataFrame, k: Int): DataFrame = {
    // Native codegen'd kernel (graft.functions.MinHashSig): one tight loop
    // per row for split → shingle → md5 → k mixed minima. The declarative
    // HOF pipeline computes the same values ~20× slower (interpreted lambda
    // evaluation per array element); semantics and oracle SQL unchanged.
    // A `_rowid` column, when present, rides through so the persisted
    // index's rows stay addressable by PHYSICAL row (takedown propagation
    // anti-joins on rowid, never on a reusable key — see LshIndex.refresh).
    val keep = col("doc_id") +:
      (if (docs.columns.contains(graft.core.VectorTable.ROWID))
         Seq(col(graft.core.VectorTable.ROWID)) else Nil)
    docs
      .withColumn("mins", graft.functions.TextFunctions.minhashSig(col("text"), k))
      .where(size(col("mins")) > 0)
      .select(keep ++ (0 until k).map(j => col("mins")(j).as(s"mh$j")): _*)
  }

  /** Banding at arbitrary (bands, rowsPerBand) with r-wide ARRAY bucket
    * keys — variable arity without touching the persisted [[LshIndex]]'s
    * fixed (band, h1, h2) schema.
    */
  private[operators] def bandsOfK(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sig.select(col("doc_id"), explode(array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        array((0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*).as("bkey"))
    }: _*)).as("bb")).select(col("doc_id"), col("bb.band"), col("bb.bkey"))

  /** LSH parameter-tuning report: for every (k, bands, rowsPerBand)
    * config — the splits of the k = [[numHashes]] production signature
    * PLUS a second signature width (k = 12, the proof the family is
    * parameterized, not shape-locked to the gate default) — the MEASURED
    * candidate-pair count on this corpus next to the ANALYTIC S-curve
    * detection probability at the verification threshold
    * (P(candidate | J=τ) = 1 − (1 − τ^r)^b, τ = 1/2) — the table a
    * pipeline owner reads before choosing banding at scale: more/narrower
    * bands buy recall with more candidates (verification cost),
    * fewer/wider bands the reverse. The probability is a closed-form
    * constant per config (emitted as the same precomputed literal by both
    * engines); the candidate counts are data, measured through
    * [[pairsFromBucketedRows]] — the SAME hybrid kernel the production
    * path runs, so the report prices exactly what production would pay.
    */
  val lshTuningConfigs: Seq[(Int, Int, Int)] =
    Seq((6, 6, 1), (6, 3, 2), (6, 2, 3), (6, 1, 6), (12, 4, 3), (64, 16, 4))

  def pDetectX1e6(bands: Int, rowsPerBand: Int): Long =
    math.round((1.0 - math.pow(1.0 - math.pow(0.5, rowsPerBand), bands)) * 1e6)

  private def lshCandidateCountFor(sig: DataFrame, bands: Int, rowsPerBand: Int,
                                   gateKey: Option[String] = None): Long =
    // through the PRODUCTION path (adaptive collapse included) — the
    // report prices exactly what production would pay (round-10 wrong #3)
    bandedPairsAdaptive(sig, bandsOfK(_, bands, rowsPerBand),
      Seq("band", "bkey"), gateKey).count()

  /** First-k projection of a wider signature frame — EXACT by the shared
    * hash-family construction: component j of any minhash signature is
    * min over shingles of `(h%p · mixA(j) + mixB(j)) % p`, a function of
    * j alone, so columns mh0..mh{k-1} of a k'-wide signature (k' ≥ k)
    * ARE the k-wide signature bit for bit (the emptiness filter upstream
    * is k-independent too — empty iff the doc has no shingles).
    * SignaturePrefixSpec pins the identity. Lets ONE shingle pass serve
    * every sweep width instead of one pass per distinct k (optimization
    * guide §2.3 "don't compute things twice": the shingle loop is the
    * dominant signature cost and was previously paid per k).
    */
  private[operators] def sigPrefixK(sig: DataFrame, k: Int): DataFrame =
    if (sig.columns.count(_.startsWith("mh")) == k) sig
    else sig.select(col("doc_id") +: (0 until k).map(j => col(s"mh$j")): _*)

  def lshTuning(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // ONE signature pass at the max sweep width (k-prefix projection is
    // exact — [[sigPrefixK]]), checkpointed once; the six per-config
    // candidate counts are INDEPENDENT actions overlapped from a small
    // pool (guide §2.6: FIFO back-fill — each count's straggler tail no
    // longer serializes the whole sweep).
    val kMax = lshTuningConfigs.map(_._1).max
    val sigMax = signaturesOfK(Tables.documents(s, d), kMax).localCheckpoint()
    val counts = graft.core.Par.tasks(lshTuningConfigs.map { case (k, b, r) =>
      // gate input = the k-prefix signature over the corpus (exact
      // projection), so configs sharing k share one memoized verdict
      () => lshCandidateCountFor(sigPrefixK(sigMax, k), b, r, Some(s"bpa:$d:k$k"))
    })
    lshTuningConfigs.zip(counts).map { case ((k, b, r), n) =>
      (k, b, r, n, pDetectX1e6(b, r))
    }.toDF("k", "bands", "rows_per_band", "n_candidates", "p_detect_x1e6")
  }

  lazy val lshTuningSql: String =
    lshTuningConfigs.map { case (k, b, r) =>
      val bandCond = (0 until b).map { band =>
        (0 until r).map(j => s"a.mh${band * r + j} = b.mh${band * r + j}").mkString("(", " AND ", ")")
      }.mkString(" OR ")
      s"""SELECT $k AS k, $b AS bands, $r AS rows_per_band,
         |  (SELECT COUNT(*) FROM (
         |     SELECT DISTINCT a.doc_id, b.doc_id
         |     FROM (${minhashSignaturesSqlK(k)}) a JOIN (${minhashSignaturesSqlK(k)}) b
         |     ON a.doc_id < b.doc_id AND ($bandCond))) AS n_candidates,
         |  CAST(${pDetectX1e6(b, r)} AS BIGINT) AS p_detect_x1e6""".stripMargin
    }.mkString("", "\nUNION ALL ", "")

  /** MEASURED LSH quality report — the empirical counterpart to
    * [[lshTuning]]'s analytic S-curve: for the production banding and the
    * k = 12 config, recall and precision of the banding candidates
    * against EXACT ground truth (every pair with shingle-set Jaccard
    * ≥ τ = [[exactTauNum]]/[[exactTauDen]], computed by the lossless
    * [[exactJaccardJoinOf]] PPJoin — no shared-candidate circularity: the
    * truth set does not come from LSH). The analytic P(candidate | J=τ)
    * is a model; this row is what the corpus actually measured — the
    * number a pipeline owner quotes when asked "how many near-dups does
    * the approximate path miss?". Ratios are reported in integer permille
    * (1000·found // denominator, exact int64 in both engines) so no float
    * boundary can flip a digit across engines.
    *
    * Scale shape: truth = the exact join (linear candidates, proven in
    * ScaleProbe); per config one banding chain + a candidate-sized
    * left-semi against the truth pairs; counts are bounded scalars. At
    * 100 TB run it on a stratified sample — the ratio, not the corpus,
    * is the product.
    */
  val lshRecallConfigs: Seq[(Int, Int, Int)] =
    Seq((6, 3, 2), (12, 4, 3), (64, 16, 4))

  def lshRecall(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    // ONE signature pass at the max config width (exact k-prefix
    // projection, [[sigPrefixK]] — previously one shingle pass per k),
    // then the four independent builds — the exact-truth PPJoin and one
    // banding chain per config — overlap from a small pool (guide §2.6);
    // the truth join is the longest chain and the banding chains
    // back-fill its tail instead of queueing behind it.
    val kMax = lshRecallConfigs.map(_._1).max
    val sigMax = signaturesOfK(docs, kMax).localCheckpoint()
    val truthTask: () => Either[(DataFrame, Long), DataFrame] = () => {
      val t = exactJaccardJoinOf(
        docs.select(col("doc_id"),
          graft.functions.TextFunctions.shingleHashes(col("text")).as("sh"))
          .where(size(col("sh")) > 0),
        Some(s"xjj:$d")) // same derivation as the declared join face
        .select("doc_a", "doc_b").localCheckpoint()
      Left((t, t.count()))
    }
    val candTasks: Seq[() => Either[(DataFrame, Long), DataFrame]] =
      lshRecallConfigs.map { case (k, b, r) =>
        () => Right(bandedPairsAdaptive(sigPrefixK(sigMax, k),
          bandsOfK(_, b, r), Seq("band", "bkey"), Some(s"bpa:$d:k$k"))
          .localCheckpoint())
      }
    val built = graft.core.Par.tasks(truthTask +: candTasks)
    val (truth, nTrue) = built.head.swap.getOrElse(sys.error("truth task"))
    val cands = built.tail.map(_.getOrElse(sys.error("cand task")))
    // per config ONE action yields (n_candidates, found): truth pairs are
    // unique by construction, so the left join preserves candidate
    // cardinality and count(hit) ≡ the previous left-semi count — two
    // scheduler round-trips fused into one, again overlapped
    val stats = graft.core.Par.tasks(cands.map { c =>
      () => {
        val r = c.join(truth.withColumn("hit", lit(1)), Seq("doc_a", "doc_b"), "left")
          .agg(count(lit(1)).as("nc"), count(col("hit")).as("nf")).head()
        (r.getLong(0), r.getLong(1))
      }
    })
    lshRecallConfigs.zip(stats).map { case ((k, b, r), (nCand, found)) =>
      (k, b, r, nTrue, nCand, found,
        if (nTrue == 0L) 0L else 1000L * found / nTrue,
        if (nCand == 0L) 0L else 1000L * found / nCand)
    }.toDF("k", "bands", "rows_per_band", "true_pairs", "n_candidates",
      "found", "recall_permille", "precision_permille")
  }

  lazy val lshRecallSql: String = {
    val configRows = lshRecallConfigs.map { case (k, b, r) =>
      val bandCond = (0 until b).map { band =>
        (0 until r).map(j => s"a.mh${band * r + j} = b.mh${band * r + j}")
          .mkString("(", " AND ", ")")
      }.mkString(" OR ")
      s"""SELECT $k AS k, $b AS bands, $r AS rows_per_band,
         |  (SELECT COUNT(*) FROM truth) AS true_pairs,
         |  (SELECT COUNT(*) FROM (
         |     SELECT DISTINCT a.doc_id, b.doc_id
         |     FROM (${minhashSignaturesSqlK(k)}) a JOIN (${minhashSignaturesSqlK(k)}) b
         |     ON a.doc_id < b.doc_id AND ($bandCond))) AS n_candidates,
         |  (SELECT COUNT(*) FROM (
         |     SELECT DISTINCT a.doc_id AS ca, b.doc_id AS cb
         |     FROM (${minhashSignaturesSqlK(k)}) a JOIN (${minhashSignaturesSqlK(k)}) b
         |     ON a.doc_id < b.doc_id AND ($bandCond)) c
         |   JOIN truth t ON c.ca = t.doc_a AND c.cb = t.doc_b) AS found""".stripMargin
    }.mkString("(", ")\nUNION ALL (", ")")
    s"""WITH truth AS (SELECT doc_a, doc_b FROM (${exactJaccardJoinSql.replace("\n", "\n  ")})),
       | cfg AS ($configRows)
       |SELECT k, bands, rows_per_band, true_pairs, n_candidates, found,
       |  CASE WHEN true_pairs = 0 THEN 0 ELSE 1000 * found // true_pairs END AS recall_permille,
       |  CASE WHEN n_candidates = 0 THEN 0 ELSE 1000 * found // n_candidates END AS precision_permille
       |FROM cfg""".stripMargin
  }

  /** Banding stage: k-row signature → (doc_id, band, h1, h2) bucket rows.
    * A `_rowid` column on the signature frame rides through (see
    * [[signaturesOfK]]).
    */
  private[operators] def bandsOf(sig: DataFrame): DataFrame = {
    val keep = col("doc_id") +:
      (if (sig.columns.contains(graft.core.VectorTable.ROWID))
         Seq(col(graft.core.VectorTable.ROWID)) else Nil)
    sig.select(keep :+ explode(array(
      (0 until numHashes / 2).map(b =>
        struct(lit(b).as("band"), col(s"mh${2 * b}").as("h1"), col(s"mh${2 * b + 1}").as("h2"))): _*
    )).as("bb"): _*)
      .select(keep ++ Seq(col("bb.band"), col("bb.h1"), col("bb.h2")): _*)
  }

  /** Bucket-occupancy cap for in-row pair expansion: buckets at or below
    * it expand inside their aggregation row (the measured-4×-cheaper form
    * for LSH-typical occupancies of a handful of docs); buckets ABOVE it
    * are routed through a per-pair-row self-join, where a hot bucket costs
    * streamed join-task time instead of materializing B²/2 pair structs in
    * ONE row of ONE task. The cap bounds in-row work at cap²/2 ≈ 32k
    * structs — far below any task-killing size — while a dup-heavy corpus
    * (10⁵ copies of one boilerplate page, the classic web-crawl pathology)
    * flows through the join form that survives it.
    */
  val bucketExpandCap = 256

  /** Occupancy-capped hybrid pair expansion over (keyCols..., doc_id)
    * bucket rows — the shared kernel of the MinHash band join and the
    * generalized (k, b, r) banding. ONE aggregation on the bucket key (the
    * signature/banding chain upstream executes exactly once); the
    * checkpoint materializes the SLIM bucket rows (≈ one array slot per
    * band row — orders of magnitude smaller than the corpus) so the two
    * occupancy branches read materialized rows instead of re-running the
    * chain per branch.
    */
  private[operators] def pairsFromBucketedRows(rows: DataFrame, keyCols: Seq[String],
                                               cap: Int): DataFrame =
    pairDistinct(pairsFromBucketedRowsRaw(rows, keyCols, cap))

  /** The expansion WITHOUT the cross-bucket dedup — for callers whose
    * bucket key holds each pair at most once (e.g. the exact-set groups,
    * where every pair lives in exactly one group), for whom the dedup
    * exchange would be pure overhead on an already-unique stream.
    */
  private[operators] def pairsFromBucketedRowsRaw(rows: DataFrame, keyCols: Seq[String],
                                                  cap: Int): DataFrame = {
    val key = keyCols.map(col)
    val buckets = rows
      .groupBy(key: _*)
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .where(size(col("ids")) > 1)
      .localCheckpoint()
    val coldPairs = buckets.where(size(col("ids")) <= cap)
      .select(explode(expr(
        // all ordered pairs (ids[i], ids[j]) with i < j from the sorted bucket
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y -> struct(x AS doc_a, y AS doc_b))))""".stripMargin
      )).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
    // Hot buckets: BLOCKED triangular self-join. A plain self-join on the
    // bucket key funnels a B-doc bucket's B²/2 output pairs through the few
    // tasks holding that key — at B = 10⁴ one task streams ~5·10⁷ pairs
    // into its partial-aggregation hash map and the heap dies before the
    // spill path helps (measured: the ppjoin dup-heavy probe OOM'd exactly
    // there). Slicing each hot bucket into ns = ⌈B/cap⌉ hash slices and
    // joining (slice_a ≤ slice_b) pairs bounds EVERY task at ~cap² output
    // rows: quadratic work still happens — it must — but as ns²/2
    // uniformly small tasks, which is precisely the shape that survives a
    // 1000-executor cluster. Each unordered pair forms exactly once:
    // across slices via the sa < sb replication, within a slice via
    // da < db; least/greatest restores the canonical orientation.
    val hotRows = buckets.where(size(col("ids")) > cap)
      .withColumn("ns", ceil(size(col("ids")).cast("double") / cap).cast("int"))
      .select(key ++ Seq(col("ns"), explode(col("ids")).as("doc_id")): _*)
      .withColumn("sl", pmod(xxhash64(col("doc_id")), col("ns").cast("long")).cast("int"))
    val hotLeft = hotRows
      .withColumn("sb", explode(sequence(col("sl"), col("ns") - 1)))
      .select(key ++ Seq(col("sl").as("sa"), col("sb"), col("doc_id").as("da")): _*)
    val hotRight = hotRows
      .select(key ++ Seq(col("sl").as("sb"), col("doc_id").as("db")): _*)
    val hotPairs = hotLeft
      .join(hotRight, keyCols :+ "sb")
      .where(col("sa") < col("sb") || col("da") < col("db"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"))
    coldPairs.unionAll(hotPairs)
  }

  /** SORT-based pair dedup — `.distinct()` without the hash maps. A plain
    * distinct runs map-side partial hash aggregation, whose per-task map
    * grows with every distinct pair the task sees; on a dup-heavy corpus
    * (10⁴-copy clique ⇒ 5·10⁷ real pairs) those maps are ~10⁷ mostly-
    * unique entries per task and combine almost nothing (a pair's
    * duplicates land in DIFFERENT bucket tasks), so they are pure memory
    * pressure — the measured heap-death shape at cap-bounded join output.
    * The window form exchanges raw pair rows and SORTS each reduce
    * partition (ExternalSorter, spills to disk by design), keeping peak
    * memory O(partition sort buffer) no matter how many pairs flow.
    */
  private def pairDistinct(pairs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_a", "doc_b").orderBy("doc_a")
    pairs.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
  }

  /** Pair stage: the hybrid kernel on the (band, h1, h2) bucket key (see
    * [[lshCandidatePairs]] for why not a plain row self-join).
    */
  private[operators] def pairsFromBands(bands: DataFrame): DataFrame =
    pairsFromBands(bands, bucketExpandCap)

  private[operators] def pairsFromBands(bands: DataFrame, cap: Int): DataFrame =
    pairsFromBucketedRows(bands, Seq("band", "h1", "h2"), cap)

  // ----- EXACT-SET COLLAPSE, generalized (round-12) --------------------
  /** Cheap duplication PRE-GATE: ONE aggregate pass over the collapse
    * group key — map-side HLL++ (deterministic) + a count, exchanged as
    * sketches, never rows. est_distinct/n at or above 95% means duplicate
    * mass sits below the gate's resolution, so the adaptive entries skip
    * the exact group-stats exchange entirely and stay flat. The gate picks
    * a PLAN, never a row — both branches emit identical pairs.
    *
    * Documented limitation: a clique that is a vanishing fraction of a
    * huge corpus hides below HLL resolution and keeps the flat plan. That
    * is the regime where the clique's blocked-slice work is noise against
    * corpus-linear cost anyway — the collapse's 29× win (PLANS.md
    * round-11) needs duplication MASS, which is exactly what HLL sees.
    */
  private val lowDupGatePermille = 950L

  private[operators] def lowDupPreGate(keyed: DataFrame, key: Column): Boolean = {
    val r = keyed.agg(count(lit(1)).as("n"),
      approx_count_distinct(key, 0.02).as("nd")).head()
    val n = r.getLong(0)
    n == 0L || 1000L * r.getLong(1) >= lowDupGatePermille * n
  }

  /** Session-memoized [[lowDupPreGate]] (round-19): every adaptive face
    * pays the gate aggregate PER INVOCATION, but for the declared faces
    * the gate's input is a write-once fixture — the corpus tables or a
    * machine-memoized stored index — so its verdict is a pure function of
    * (session, input identity): the docCountCache / deltaCutoff precedent
    * applied to the routing aggregate. Keys name the INPUT (corpus dir +
    * derivation, or index root), never the face, so two faces reading the
    * same frame share one verdict, and callers over per-batch / test
    * frames pass None and keep the per-invocation gate (the streaming
    * ingest gates' batches are NOT immutable). This memoizes a PLAN
    * CHOICE, never a row — both branches emit identical pairs by the
    * collapse contracts.
    */
  private[operators] val preGateCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private[operators] def lowDupPreGateMemo(gateKey: Option[String],
                                           keyed: DataFrame, key: Column): Boolean =
    gateKey match {
      case None => lowDupPreGate(keyed, key)
      case Some(k) =>
        val sid = ensureEvictionListener(keyed.sparkSession)
        preGateCache.computeIfAbsent(sid + ":" + k,
          _ => Boolean.box(lowDupPreGate(keyed, key))).booleanValue
    }

  /** The shared 128-bit collapse-group fingerprint: `f1` = xxhash64 of the
    * canonical value, `f2` = the LOW 64 bits of its md5, taken over the
    * value's canonical JSON serialization. The two halves come from
    * STRUCTURALLY UNRELATED hash families over DIFFERENT serializations
    * (xxhash64 walks Spark's internal binary row format; md5 digests JSON
    * text), so a both-halves collision requires simultaneously defeating a
    * speed hash and a cryptographic digest on independent byte streams —
    * unlike the previous `(xxhash64(x), xxhash64(1L, x))` pair, whose
    * halves shared one non-cryptographic mixing core (round-12 ADVICE: a
    * structured input could plausibly collide both). md5's known collision
    * constructions need crafted binary blocks that are not valid JSON
    * int64-array text, and any such pair would still have to collide
    * xxhash64 over the separate binary form. Key width stays 16 bytes
    * (long + 8-byte binary), so the exchange-payload win the fingerprint
    * exists for (round-11 wrong #1) is unchanged.
    */
  private[operators] def fpKeyed(df: DataFrame, canon: Column): DataFrame =
    df.select(xxhash64(canon).as("f1"),
      unhex(substring(md5(to_json(canon)), 17, 16)).as("f2"),
      col("doc_id"))

  /** [[fpKeyed]] for callers outside the operators package (the streaming
    * ingest gates' batch-level collapse grouping uses the SAME two-family
    * key as every other collapse site — round-13 ADVICE: an md5-only batch
    * fingerprint would make a false collision silently DROP a distinct
    * vector, not merely degrade a plan choice).
    */
  private[graft] def fpKeyedFor(df: DataFrame, canon: Column): DataFrame =
    fpKeyed(df, canon)

  /** One (gid = min doc_id, gsize) row per distinct group key — the
    * row-shaped group metadata every collapse body shares (no row ever
    * holds a member list).
    */
  private[operators] def groupFrame(keyed: DataFrame, keyCols: Seq[String]): DataFrame =
    keyed.groupBy(keyCols.map(col): _*)
      .agg(min(col("doc_id")).as("gid"), count(lit(1)).as("gsize"))

  /** (n, maxGroup, intraPairs) for [[shouldCollapse]] — coalesced so an
    * empty frame decides "flat" instead of throwing.
    */
  private[operators] def groupShapeStats(groups: DataFrame): (Long, Long, Long) = {
    val r = groups.agg(
      coalesce(sum(col("gsize")), lit(0L)),
      coalesce(max(col("gsize")), lit(0L)),
      coalesce(sum(col("gsize") * (col("gsize") - lit(1L))), lit(0L))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2) / 2L)
  }

  /** Doc-level candidate pairs from rep-level pairs + intra-group cliques
    * — the shared collapse expansion for candidate faces (no payload
    * columns): intra pairs stream through the blocked kernel keyed on the
    * group id (each pair lives in exactly ONE group — unique by
    * construction, no dedup exchange), cross pairs through two streaming
    * membership joins (never an |A|·|B| array in one row). The two
    * streams are disjoint (same-group vs cross-group), so the union needs
    * no reduction.
    */
  private def expandCandidateRepPairs(repPairs: DataFrame, membership: DataFrame): DataFrame = {
    val intra = pairsFromBucketedRowsRaw(
      membership.where(col("gsize") > 1).select(col("gid"), col("doc_id")),
      Seq("gid"), bucketExpandCap)
    val cross = repPairs
      .join(membership.select(col("gid").as("doc_a"), col("doc_id").as("da")), Seq("doc_a"))
      .join(membership.select(col("gid").as("doc_b"), col("doc_id").as("db")), Seq("doc_b"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"))
    intra.unionAll(cross)
  }

  /** ADAPTIVE EXACT-SET COLLAPSE for the MinHash banding family — the
    * round-11 exact-Jaccard collapse extended to candidate generation
    * (round-11 verdict #1): identical documents have identical signatures,
    * hence identical band buckets, hence identical candidate
    * relationships, so banding runs on ONE REPRESENTATIVE per distinct
    * signature and doc-level pairs are reconstructed by the membership
    * joins — prefix/bucket/reduction work scales with DISTINCT signatures
    * while a boilerplate clique's C(g,2) answer streams through the
    * dedup-free intra expansion (the dup-heavy probe priced the flat
    * candidate stage at 338 s vs 10.1 s collapsed for the full join).
    *
    * Group identity is the signature VECTOR, fingerprinted to the shared
    * 128-bit two-family key ([[fpKeyed]]) so the group/membership
    * exchanges carry 16-byte keys regardless of k. Candidate-ness is a function of the signature alone,
    * so collapsed ≡ flat PAIR-FOR-PAIR (CollapseEquivalenceSpec pins it);
    * the branch is a pure plan choice — [[lowDupPreGate]] (one cheap agg)
    * then [[shouldCollapse]] on the same shape stats as the exact join.
    *
    * The signature frame is localCheckpoint'd first: the gate, stats,
    * banding and membership consumers all read the slim materialized
    * (doc_id, mh*) rows — the shingle/md5 kernel executes exactly once no
    * matter the branch.
    */
  private[operators] def bandedPairsAdaptive(sigIn: DataFrame,
                                             toBuckets: DataFrame => DataFrame,
                                             keyCols: Seq[String],
                                             gateKey: Option[String] = None): DataFrame = {
    val sig = sigIn.localCheckpoint()
    val mh = sig.columns.filter(_ != "doc_id")
    val fp1 = xxhash64(mh.map(col): _*)
    def flat = pairsFromBucketedRows(toBuckets(sig), keyCols, bucketExpandCap)
    if (lowDupPreGateMemo(gateKey, sig, fp1)) flat
    else {
      val keyed = fpKeyed(sig, array(mh.map(col): _*))
      val groups = groupFrame(keyed, Seq("f1", "f2"))
      val (n, maxg, intra) = groupShapeStats(groups)
      if (!shouldCollapse(n, maxg, intra)) flat
      else bandedPairsCollapsedBody(sig, keyed, toBuckets, keyCols)
    }
  }

  /** The forced collapse body (split out so the equivalence spec can pin
    * it against the flat kernel on fixtures below the adaptive threshold).
    */
  private[operators] def bandedPairsCollapsedBody(sigIn: DataFrame,
                                                  toBuckets: DataFrame => DataFrame,
                                                  keyCols: Seq[String]): DataFrame = {
    val sig = sigIn.localCheckpoint()
    val mh = sig.columns.filter(_ != "doc_id")
    val keyed = fpKeyed(sig, array(mh.map(col): _*))
    bandedPairsCollapsedBody(sig, keyed, toBuckets, keyCols)
  }

  private def bandedPairsCollapsedBody(sig: DataFrame, keyed: DataFrame,
                                       toBuckets: DataFrame => DataFrame,
                                       keyCols: Seq[String]): DataFrame = {
    val g = groupFrame(keyed, Seq("f1", "f2")).localCheckpoint()
    val membership = keyed.join(g, Seq("f1", "f2"))
      .select(col("gid"), col("doc_id"), col("gsize")).localCheckpoint()
    val reps = sig.join(g.select(col("gid").as("doc_id")), Seq("doc_id"), "left_semi")
    val repPairs = pairsFromBucketedRows(toBuckets(reps), keyCols, bucketExpandCap)
    expandCandidateRepPairs(repPairs, membership)
  }

  private def minhashSignaturesSqlK(k: Int): String = {
    // base reduced mod p before the mix — same values as the unreduced
    // form (modular arithmetic), exact int64 at any k in BOTH engines
    val mins = (0 until k)
      .map(j => s"list_min(list_transform(hs, h -> ((h % ${mixP}) * ${mixA(j)} + ${mixB(j)}) % ${mixP})) AS mh$j")
      .mkString(",\n ")
    s"""SELECT doc_id,
       | $mins
       |FROM (SELECT doc_id,
       |        list_transform(shingles, g -> ('0x' || substr(md5(g), 1, 13))::BIGINT) AS hs
       |      FROM (SELECT doc_id, $shingleSqlExpr AS shingles
       |            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
       |      WHERE len(shingles) > 0)""".stripMargin
  }

  val minhashSignaturesSql: String = minhashSignaturesSqlK(numHashes)

  /** Second-config LSH candidates (k = 12, 4 bands × 3 rows): the declared
    * proof that signatures, banding, the hybrid pair kernel and the oracle
    * generation all generalize over (k, b, r) — production MinHash dedup
    * runs k = 64-128, and nothing here is wired to the k = 6 default
    * beyond the one constant. Wider bands (r = 3) trade recall
    * (P(cand|J=½) ≈ 41% vs 58% for (3,2)) for a sharper S-curve — fewer
    * accidental candidates per true near-dup at scale.
    */
  val lshK12 = 12
  val lshB12 = 4
  val lshR12 = 3

  def lshCandidatePairsK12(s: SparkSession, d: String): DataFrame =
    bandedPairsAdaptive(signaturesOfK(Tables.documents(s, d), lshK12),
      bandsOfK(_, lshB12, lshR12), Seq("band", "bkey"), Some(s"bpa:$d:k$lshK12"))

  /** Generated oracle at arbitrary (k, b, r) — the k12 and k64 faces share
    * it, and any future config gets its oracle for free.
    */
  private def lshCandidatePairsSqlK(k: Int, b: Int, r: Int): String = {
    val bandCond = (0 until b).map { band =>
      (0 until r).map(j => s"a.mh${band * r + j} = b.mh${band * r + j}")
        .mkString("(", " AND ", ")")
    }.mkString(" OR ")
    s"""WITH sig AS (${minhashSignaturesSqlK(k)})
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM sig a JOIN sig b
       |  ON a.doc_id < b.doc_id AND ($bandCond)""".stripMargin
  }

  lazy val lshCandidatePairsK12Sql: String =
    lshCandidatePairsSqlK(lshK12, lshB12, lshR12)

  /** PRODUCTION-WIDTH face: k = 64 in 16 bands × 4 rows — the signature
    * width real large-scale MinHash dedup runs (64-128 hashes; round-11
    * verdict #3). (16, 4) trades a much sharper S-curve than the gate
    * default (P(cand | J=½) ≈ 64% with near-zero accidental-candidate
    * mass below J ≈ 0.3) for 16 band buckets per doc. The declared face +
    * its tuning and recall rows prove the kernel, the banding, the
    * adaptive collapse and the oracle GENERATION all hold at the width
    * production would configure — nothing is wired to k = 6 beyond the
    * default constant. Exact-int64 arithmetic at this width comes from
    * the mod-reduced mix (see [[signaturesOfK]]).
    */
  val lshK64 = 64
  val lshB64 = 16
  val lshR64 = 4

  def lshCandidatePairsK64(s: SparkSession, d: String): DataFrame =
    bandedPairsAdaptive(signaturesOfK(Tables.documents(s, d), lshK64),
      bandsOfK(_, lshB64, lshR64), Seq("band", "bkey"), Some(s"bpa:$d:k$lshK64"))

  lazy val lshCandidatePairsK64Sql: String =
    lshCandidatePairsSqlK(lshK64, lshB64, lshR64)

  /** LSH candidate pairs: band the k-row signature into bands of 2 rows;
    * docs sharing any band bucket become a candidate pair.
    *
    * Executed as ONE aggregation on the bucket key (band, h1, h2) — not a
    * plain row self-join: a self-join on the un-aggregated band rows would
    * recompute the whole MinHash pipeline for both sides (2× the dominant
    * cost at any scale) and shuffle the signature table twice. Here
    * signatures are computed once, shuffled once, and pair expansion is the
    * occupancy-capped hybrid ([[pairsFromBucketedRows]]): in-row below
    * [[bucketExpandCap]] (measured 4× faster than a self-join at sf0.1 on
    * LSH-typical occupancy), per-pair-row join above it so a dup-heavy hot
    * bucket can never blow up a single task. Clique-shaped duplication
    * additionally takes the exact-set collapse ([[bandedPairsAdaptive]]):
    * banding runs on one representative per distinct signature.
    */
  def lshCandidatePairs(s: SparkSession, d: String): DataFrame =
    bandedPairsAdaptive(signaturesOf(Tables.documents(s, d)),
      bandsOf, Seq("band", "h1", "h2"), Some(s"bpa:$d:k$numHashes"))

  /** Documents ingested into a VectorTable in two stages with an
    * [[LshIndex]] built on the first and INCREMENTALLY refreshed for the
    * second — cached per (machine, sf dir) behind the pointer protocol.
    * The declared query then reads candidates from the index, so the
    * oracle (which recomputes from raw text) proves incremental
    * maintenance is lossless.
    */
  /** Best-effort recursive delete for a pointer-protocol race LOSER's
    * fully-built directory (round-11 ADVICE: the loser adopted the winner's
    * pointer but left its own table/index/staging/ckpt orphaned in tmpdir).
    * Failures are swallowed — cleanup is hygiene, never correctness.
    */
  private[operators] def deleteRecursively(dir: java.nio.file.Path): Unit =
    try {
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    } catch { case scala.util.control.NonFatal(_) => () }

  private val lshIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, LshIndex]()
  private def documentsLshIndex(s: SparkSession, d: String): LshIndex =
    lshIndexes.computeIfAbsent(d, _ => {
      import java.nio.file.{Files, Paths, StandardOpenOption}
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft-rowid-tables")
      Files.createDirectories(base)
      val pointer = base.resolve(s"docs-lsh-$key.path")
      if (!Files.exists(pointer)) {
        val dir = base.resolve(s"docs-lsh-$key-${java.util.UUID.randomUUID()}")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val cutoff = docs.agg(max(col("doc_id"))).head.getLong(0) / 2
        val t = graft.core.VectorTable.create(s, s"$dir/table")
        t.append(docs.where(col("doc_id") <= cutoff))
        val idx = LshIndex.build(t, s"$dir/index")
        t.append(docs.where(col("doc_id") > cutoff))
        idx.refresh(t)
        try Files.write(pointer, dir.toString.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          deleteRecursively(dir) } // racer won; adopt theirs, drop our build
      }
      LshIndex.open(s, s"${Files.readString(pointer)}/index")
    })

  def prebuildLshIndex(s: SparkSession, d: String): Unit =
    documentsLshIndex(s, d)

  /** Candidate pairs served from the persisted two-stage index (no
    * signature recomputation at query time). Oracle: identical SQL to
    * [[lshCandidatePairs]] — DuckDB recomputes from raw text.
    */
  def lshIndexCandidates(s: SparkSession, d: String): DataFrame =
    documentsLshIndex(s, d).candidatePairs()

  // lazy: lshCandidatePairsSql is declared later in this object, and a
  // strict val here would read it before initialization (null)
  lazy val lshIndexCandidatesSql: String = lshCandidatePairsSql

  /** INCREMENTAL near-dup maintenance — the production delta query for
    * continuous ingest: candidate pairs TOUCHING THE NEW BATCH only, via
    * index-vs-delta banding. At 100 TB you never re-run the full pair join
    * per corpus drop (the reference's entire write path is incremental
    * append, src/cache/writable_cache.rs:78-95); per drop you join the
    * delta's band rows against the full persisted index and verify only
    * those pairs. Both sides here read STORED band rows from the
    * [[LshIndex]] — the plan touches no document text at all (no
    * re-shingling of anything, old or new; DeltaCandidatesSpec pins the
    * scan set), and the delta side is the appended doc_id span of the
    * two-stage build. delta×all covers delta-delta and delta-old pairs
    * exactly once after least/greatest canonicalization; old-old pairs —
    * the ones a full recompute would redundantly re-emit every drop —
    * never form. Oracle: the FULL recompute from raw text, filtered to
    * pairs with ≥ 1 delta doc — a green row is the proof the delta path
    * loses nothing against rerunning everything.
    */
  def deltaCandidatePairs(s: SparkSession, d: String): DataFrame =
    deltaCandidatesFromBands(documentsLshIndex(s, d).bands, deltaCutoff(s, d),
      Some(s"dcb:$d"))

  /** The delta-vs-index banding join itself, over any stored band-row frame
    * — shared by the batch face above and the STREAMED-index face
    * ([[deltaCandidatePairsStreamed]]), which differ only in how the index
    * was maintained.
    *
    * Blocked like every other pair path (see [[containmentCandidatesOf]]):
    * a boilerplate clique arriving in a drop puts every copy in the same
    * band bucket on BOTH sides, so the bipartite delta×index join is
    * sliced per bucket at ⌈occupancy/cap⌉ on each side and joined on
    * (bucket, sa, sd) — per-task output bounded at ~cap², no replication
    * at all for buckets at or below cap occupancy.
    */
  private[operators] def deltaCandidatesFromBands(all: DataFrame, cutoff: Long,
                                                  gateKey: Option[String] = None): DataFrame = {
    // Pre-gate ON STORED ROWS ONLY: HLL duplication of the band-0 bucket
    // key. A boilerplate clique puts every copy in the same band-0 bucket,
    // dropping the distinct/total ratio below the gate; genuinely-near-dup
    // collisions can also trip it, which only costs the (cheap) exact
    // stats pass — the conservative direction.
    val b0 = all.where(col("band") === 0)
    if (lowDupPreGateMemo(gateKey, b0, xxhash64(col("h1"), col("h2"))))
      deltaCandidatesFromBandsFlat(all, cutoff)
    else {
      // group docs by their FULL stored band-row set (≡ the signature:
      // identical content ⇒ identical rows) — assembled per doc from
      // stored rows (k/2 structs per row, bounded), fingerprinted to the
      // shared 128-bit keys. The plan still touches ONLY index parquet.
      val keyed = fpKeyed(
        all.groupBy(col("doc_id"))
          .agg(sort_array(collect_list(struct(col("band"), col("h1"), col("h2")))).as("sig")),
        col("sig"))
        .localCheckpoint()
      val groups = groupFrame(keyed, Seq("f1", "f2"))
      val (n, maxg, intra) = groupShapeStats(groups)
      if (!shouldCollapse(n, maxg, intra)) deltaCandidatesFromBandsFlat(all, cutoff)
      else {
        val g = groups.localCheckpoint()
        val membership = keyed.join(g, Seq("f1", "f2"))
          .select(col("gid"), col("doc_id"), col("gsize")).localCheckpoint()
        // only groups holding >= 1 delta member can source delta-touching
        // pairs; banding runs delta-group reps x all reps, blocked
        val deltaG = membership.where(col("doc_id") > cutoff)
          .select(col("gid")).distinct().localCheckpoint()
        val repBands = all.join(g.select(col("gid").as("doc_id")), Seq("doc_id"), "left_semi")
          .localCheckpoint()
        val deltaRepBands = repBands.join(deltaG.withColumnRenamed("gid", "doc_id"),
          Seq("doc_id"), "left_semi")
        val repPairs = deltaBandsBlocked(repBands, deltaRepBands)
        // doc-level reconstruction, filtered to pairs touching the delta
        // (the flat path's contract): intra streams dedup-free from
        // delta-touching groups; cross lifts rep pairs through membership
        val intraPairs = pairsFromBucketedRowsRaw(
          membership.join(deltaG, Seq("gid"), "left_semi")
            .where(col("gsize") > 1).select(col("gid"), col("doc_id")),
          Seq("gid"), bucketExpandCap)
          .where(col("doc_a") > cutoff || col("doc_b") > cutoff)
        val crossPairs = repPairs
          .join(membership.select(col("gid").as("doc_a"), col("doc_id").as("da")), Seq("doc_a"))
          .join(membership.select(col("gid").as("doc_b"), col("doc_id").as("db")), Seq("doc_b"))
          .where(col("da") > cutoff || col("db") > cutoff)
          .select(least(col("da"), col("db")).as("doc_a"),
            greatest(col("da"), col("db")).as("doc_b"))
        intraPairs.unionAll(crossPairs)
      }
    }
  }

  private[operators] def deltaCandidatesFromBandsFlat(all: DataFrame, cutoff: Long): DataFrame =
    deltaBandsBlocked(all, all.where(col("doc_id") > cutoff))

  /** The blocked bipartite delta×all banding join over explicit frames —
    * shared by the flat path (delta = the appended doc_id span) and the
    * collapse path (delta = delta-group representatives).
    */
  private def deltaBandsBlocked(all: DataFrame, delta: DataFrame): DataFrame =
    deltaPairsBlocked(all, delta, Seq("band", "h1", "h2"))

  /** Generalized over the bucket key — the SimHash delta face runs the
    * same join on (pc, pv) pigeonhole buckets.
    */
  /** [[deltaPairsBlocked]] for callers outside the operators package
    * (the streaming ingest gates).
    */
  private[graft] def deltaPairsBlockedFor(all: DataFrame, delta: DataFrame,
                                          key: Seq[String]): DataFrame =
    deltaPairsBlocked(all, delta, key)

  /** The production signature→banding chain over a (doc_id, text) frame,
    * for callers outside the operators package (the LSH ingest gate bands
    * each micro-batch with exactly the rows [[LshIndex]] stores).
    */
  private[graft] def bandRowsFor(docs: DataFrame): DataFrame =
    bandsOf(signaturesOf(docs))

  /** [[deltaCandidatesFromBands]] / [[deleteRecursively]] for the pricing
    * tools outside the operators package.
    */
  private[graft] def deltaCandidatesFromBandsFor(all: DataFrame, cutoff: Long): DataFrame =
    deltaCandidatesFromBands(all, cutoff)
  private[graft] def deleteRecursivelyFor(dir: java.nio.file.Path): Unit =
    deleteRecursively(dir)

  /** [[connectedComponentsOf]] for callers outside the operators package
    * (the semantic ingest gate decomposes its survivor graph into
    * components before sweeping). Input (doc_a, doc_b) pairs; output
    * (id, cluster_id) labels.
    */
  private[graft] def connectedComponentsFor(pairs: DataFrame,
                                            smallGraphLimit: Long): DataFrame =
    connectedComponentsOf(pairs, smallGraphLimit)

  private[operators] def deltaPairsBlocked(all: DataFrame, delta: DataFrame,
                                           key: Seq[String]): DataFrame = {
    val kc = key.map(col)
    val slices = all.groupBy(kc: _*).agg(count(lit(1)).as("ca"))
      .join(delta.groupBy(kc: _*).agg(count(lit(1)).as("cd")), key)
      .select(kc ++ Seq(
        ceil(col("ca").cast("double") / bucketExpandCap).cast("int").as("nsa"),
        ceil(col("cd").cast("double") / bucketExpandCap).cast("int").as("nsd")): _*)
    val deltaS = delta.select(kc :+ col("doc_id").as("da"): _*)
      .join(slices, key)
      .withColumn("sd", pmod(xxhash64(col("da")), col("nsd").cast("long")).cast("int"))
      .withColumn("sa", explode(sequence(lit(0), col("nsa") - 1)))
      .drop("nsa", "nsd")
    val allS = all.select(kc :+ col("doc_id").as("db"): _*)
      .join(slices, key)
      .withColumn("sa", pmod(xxhash64(col("db")), col("nsa").cast("long")).cast("int"))
      .withColumn("sd", explode(sequence(lit(0), col("nsd") - 1)))
      .drop("nsa", "nsd")
    pairDistinct(
      deltaS.join(allS, key ++ Seq("sa", "sd"))
        .where(col("da") =!= col("db"))
        .select(least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b")))
  }

  /** The two-stage build's append boundary (max doc_id / 2 — the same rule
    * [[documentsLshIndex]] splits on): docs above it are the "new batch".
    */
  /** Session-memoized like [[documentCount]] (round-18): ~12 delta faces
    * each paid this one-row max(doc_id) job per invocation; the cutoff is
    * input METADATA of the fixed corpus dir, not query work, so caching
    * it per (session, corpus) changes no face's measured computation —
    * exactly the docCountCache precedent. Evicted with the session.
    */
  private[operators] val deltaCutoffCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def deltaCutoff(s: SparkSession, d: String): Long = {
    val sid = ensureEvictionListener(s)
    deltaCutoffCache.computeIfAbsent(sid + ":" + d,
      _ => Tables.documents(s, d).agg(max(col("doc_id"))).head.getLong(0) / 2)
  }

  lazy val deltaCandidatePairsSql: String =
    s"""WITH full_pairs AS (${lshCandidatePairsSql.replace("\n", "\n  ")}),
       | cut AS (SELECT MAX(doc_id) // 2 AS c FROM documents)
       |SELECT doc_a, doc_b FROM full_pairs
       |WHERE doc_a > (SELECT c FROM cut) OR doc_b > (SELECT c FROM cut)""".stripMargin

  /** CONTINUOUS-INGEST near-dup maintenance, composed end-to-end: the delta
    * span arrives as a STREAM (staged files, one micro-batch per file,
    * [[graft.streaming.StreamIngest]] exactly-once append), and the
    * [[LshIndex]] is refreshed INSIDE the micro-batch loop (`onBatch`
    * hook) — after every batch the index is current to the new head, which
    * is the live production loop: corpus drop lands → index catches up →
    * delta candidates are served from stored rows. The declared query
    * reads the per-batch-maintained index; the oracle is the same full
    * recompute filtered to delta-touching pairs as the batch face
    * ([[deltaCandidatePairs]]) — a green row proves N incremental
    * micro-batch refreshes lose nothing against re-hashing everything.
    * Build-time verification additionally requires band-row set equality
    * against a from-scratch recompute and ≥ 2 distinct refreshes (else the
    * "incremental" claim was never exercised).
    */
  private val streamedLshRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def streamedLshIndexRoot(s: SparkSession, d: String): String =
    streamedLshRoots.computeIfAbsent(d, _ => {
      import java.nio.file.{Files, Paths, StandardOpenOption}
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d#lsh-streamed".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft-rowid-tables")
      Files.createDirectories(base)
      val pointer = base.resolve(s"docs-lsh-streamed-$key.path")
      if (!Files.exists(pointer)) {
        val dir = base.resolve(s"docs-lsh-streamed-$key-${java.util.UUID.randomUUID()}")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val cutoff = docs.agg(max(col("doc_id"))).head.getLong(0) / 2
        val t = graft.core.VectorTable.create(s, s"$dir/table")
        t.append(docs.where(col("doc_id") <= cutoff))
        val idx = new java.util.concurrent.atomic.AtomicReference(
          LshIndex.build(t, s"$dir/index"))
        val refreshes = new java.util.concurrent.atomic.AtomicInteger(0)
        docs.where(col("doc_id") > cutoff)
          .repartition(4).write.parquet(s"$dir/staging")
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/staging")
        val q = graft.streaming.StreamIngest.start(stream, t, s"$dir/ckpt",
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
          onBatch = (tab, _) => {
            val cur = idx.get()
            val next = cur.refresh(tab)
            if (next ne cur) { idx.set(next); refreshes.incrementAndGet(); () }
          })
        q.awaitTermination()
        val expect = bandsOf(signaturesOf(docs))
        // logical band rows only: the stored layout additionally carries
        // `_rowid` (physical-row addressing for takedown propagation)
        val got = idx.get().bands.select("doc_id", "band", "h1", "h2")
        val missing = expect.exceptAll(got).count()
        val extra = got.exceptAll(expect).count()
        if (missing != 0 || extra != 0 || refreshes.get() < 2)
          throw new IllegalStateException(
            s"streamed LSH index diverged: $missing missing / $extra extra band rows, " +
              s"${refreshes.get()} incremental refreshes")
        try Files.write(pointer, dir.toString.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          deleteRecursively(dir) } // racer won; adopt theirs, drop our build
      }
      Files.readString(pointer)
    })

  def prebuildStreamedLshIndex(s: SparkSession, d: String): Unit = {
    streamedLshIndexRoot(s, d); ()
  }

  /** Declared `dedup_delta_candidates_streamed`: delta-vs-index banding
    * from the STREAM-maintained index — same stored-rows-only plan as the
    * batch face, same oracle.
    */
  def deltaCandidatePairsStreamed(s: SparkSession, d: String): DataFrame = {
    val root = streamedLshIndexRoot(s, d)
    deltaCandidatesFromBands(
      LshIndex.open(s, s"$root/index").bands, deltaCutoff(s, d),
      Some(s"dcb:$root"))
  }

  lazy val deltaCandidatePairsStreamedSql: String = deltaCandidatePairsSql

  // ----- delta faces for SimHash and containment (round-12) ------------
  /** Two-stage [[SimHashIndex]] build (build on the first doc_id half,
    * incremental refresh with the second — the same split rule as
    * [[documentsLshIndex]]), memoized per (machine, sf dir) behind the
    * pointer protocol.
    */
  private val simhashIndexRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def simhashIndexRoot(s: SparkSession, d: String): String =
    simhashIndexRoots.computeIfAbsent(d, _ => {
      import java.nio.file.{Files, Paths, StandardOpenOption}
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d#simhash".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft-rowid-tables")
      Files.createDirectories(base)
      val pointer = base.resolve(s"docs-simhash-$key.path")
      if (!Files.exists(pointer)) {
        val dir = base.resolve(s"docs-simhash-$key-${java.util.UUID.randomUUID()}")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val cutoff = docs.agg(max(col("doc_id"))).head.getLong(0) / 2
        val t = graft.core.VectorTable.create(s, s"$dir/table")
        t.append(docs.where(col("doc_id") <= cutoff))
        val idx = SimHashIndex.build(t, s"$dir/index")
        t.append(docs.where(col("doc_id") > cutoff))
        idx.refresh(t)
        try Files.write(pointer, dir.toString.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          deleteRecursively(dir) } // racer won; adopt theirs, drop our build
      }
      Files.readString(pointer)
    })

  def prebuildSimhashIndex(s: SparkSession, d: String): Unit = {
    simhashIndexRoot(s, d); ()
  }

  /** Delta-vs-index SimHash candidates over STORED (doc_id, simhash) rows
    * — [[deltaCandidatesFromBands]]'s discipline for the pigeonhole path:
    * blocked bipartite delta×all on the (pc, pv) piece buckets, with the
    * signature-keyed EXACT-SET COLLAPSE when duplication is clique-shaped
    * (identical signatures ⇒ identical pieces ⇒ identical candidate
    * relationships, so reps stand in and membership joins reconstruct,
    * filtered to delta-touching pairs — the flat path's exact contract).
    */
  private[operators] def deltaSimhashCandidates(sig: DataFrame, cutoff: Long,
                                                gateKey: Option[String] = None): DataFrame = {
    def flat = deltaPairsBlocked(simhashPieces(sig, 64),
      simhashPieces(sig.where(col("doc_id") > cutoff), 64), Seq("pc", "pv"))
    if (lowDupPreGateMemo(gateKey, sig, col("simhash"))) flat
    else {
      val groups = groupFrame(sig.select(col("simhash"), col("doc_id")), Seq("simhash"))
      val (n, maxg, intra) = groupShapeStats(groups)
      if (!shouldCollapse(n, maxg, intra)) flat
      else {
        val g = groups.localCheckpoint()
        val membership = sig.join(g, Seq("simhash"))
          .select(col("gid"), col("doc_id"), col("gsize")).localCheckpoint()
        val deltaG = membership.where(col("doc_id") > cutoff)
          .select(col("gid")).distinct().localCheckpoint()
        val repSig = g.select(col("gid").as("doc_id"), col("simhash"))
        val repDelta = repSig.join(deltaG.withColumnRenamed("gid", "doc_id"),
          Seq("doc_id"), "left_semi")
        val repPairs = deltaPairsBlocked(simhashPieces(repSig, 64),
          simhashPieces(repDelta, 64), Seq("pc", "pv"))
        val intraP = pairsFromBucketedRowsRaw(
          membership.join(deltaG, Seq("gid"), "left_semi")
            .where(col("gsize") > 1).select(col("gid"), col("doc_id")),
          Seq("gid"), bucketExpandCap)
          .where(col("doc_a") > cutoff || col("doc_b") > cutoff)
        val cross = repPairs
          .join(membership.select(col("gid").as("doc_a"), col("doc_id").as("da")), Seq("doc_a"))
          .join(membership.select(col("gid").as("doc_b"), col("doc_id").as("db")), Seq("doc_b"))
          .where(col("da") > cutoff || col("db") > cutoff)
          .select(least(col("da"), col("db")).as("doc_a"),
            greatest(col("da"), col("db")).as("doc_b"))
        intraP.unionAll(cross)
      }
    }
  }

  /** Declared `dedup_delta_simhash`: per corpus drop, SimHash near-dup
    * pairs TOUCHING THE DELTA from the persisted index — candidates join
    * stored piece buckets, hamming verifies from stored signatures; the
    * plan touches no document text (DeltaIndexSpec pins the scan set).
    * Oracle: the full 64-bit recompute from raw text filtered to
    * delta-touching pairs — a green row proves the incremental index and
    * the delta join lose nothing against re-hashing everything.
    */
  def deltaSimhashPairs(s: SparkSession, d: String): DataFrame = {
    val root = simhashIndexRoot(s, d)
    // no checkpoint: the stored slim rows ARE the materialization — every
    // consumer re-reads the index parquet, and the plan pin (DeltaIndexSpec)
    // relies on those scans being visible relations
    deltaSimhashPairsFrom(
      SimHashIndex.open(s, s"$root/index").signatures, deltaCutoff(s, d),
      Some(s"dsh:$root"))
  }

  /** The candidates + hamming verification over any stored signature frame
    * — shared by the plain face above and its compacted twin, which differ
    * only in the index's file layout.
    */
  private def deltaSimhashPairsFrom(sig: DataFrame, cutoff: Long,
                                    gateKey: Option[String] = None): DataFrame = {
    val cands = deltaSimhashCandidates(sig, cutoff, gateKey)
    cands
      .join(sig.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), Seq("doc_a"))
      .join(sig.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), Seq("doc_b"))
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .where(col("hamming") <= simhashHammingMax)
      .select("doc_a", "doc_b", "hamming")
  }

  lazy val deltaSimhashPairsSql: String =
    s"""WITH p AS (${simhashNearDupPairsWideSql.replace("\n", "\n  ")}),
       | cut AS (SELECT MAX(doc_id) // 2 AS c FROM documents)
       |SELECT doc_a, doc_b, hamming FROM p
       |WHERE doc_a > (SELECT c FROM cut) OR doc_b > (SELECT c FROM cut)""".stripMargin

  /** Two-stage [[SpanIndex]] build, memoized like the other delta indexes:
    * first half builds, second half refreshes (only the appended span is
    * rolling-hashed).
    */
  private val spanIndexRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def spanIndexRoot(s: SparkSession, d: String): String =
    spanIndexRoots.computeIfAbsent(d, _ => {
      import java.nio.file.{Files, Paths, StandardOpenOption}
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d#spans".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft-rowid-tables")
      Files.createDirectories(base)
      val pointer = base.resolve(s"docs-spans-$key.path")
      if (!Files.exists(pointer)) {
        val dir = base.resolve(s"docs-spans-$key-${java.util.UUID.randomUUID()}")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val cutoff = docs.agg(max(col("doc_id"))).head.getLong(0) / 2
        val t = graft.core.VectorTable.create(s, s"$dir/table")
        t.append(docs.where(col("doc_id") <= cutoff))
        val idx = SpanIndex.build(t, s"$dir/index")
        t.append(docs.where(col("doc_id") > cutoff))
        idx.refresh(t)
        try Files.write(pointer, dir.toString.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          deleteRecursively(dir) } // racer won; adopt theirs, drop our build
      }
      Files.readString(pointer)
    })

  def prebuildSpanIndex(s: SparkSession, d: String): Unit = {
    spanIndexRoot(s, d); ()
  }

  /** STREAM-MAINTAINED [[SpanIndex]] (the `dedup_delta_candidates_streamed`
    * discipline for the span modality): the second half lands through
    * [[graft.streaming.StreamIngest]] one file per micro-batch, the index
    * refreshes inside the loop (only each appended span is rolling-hashed),
    * and the build THROWS unless the streamed index's window rows equal
    * the batch recompute exactly with ≥2 incremental refreshes observed.
    */
  private val streamedSpanRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def streamedSpanIndexRoot(s: SparkSession, d: String): String =
    streamedSpanRoots.computeIfAbsent(d, _ => {
      import java.nio.file.{Files, Paths, StandardOpenOption}
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d#spans-streamed".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft-rowid-tables")
      Files.createDirectories(base)
      val pointer = base.resolve(s"docs-spans-streamed-$key.path")
      if (!Files.exists(pointer)) {
        val dir = base.resolve(s"docs-spans-streamed-$key-${java.util.UUID.randomUUID()}")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val cutoff = docs.agg(max(col("doc_id"))).head.getLong(0) / 2
        val t = graft.core.VectorTable.create(s, s"$dir/table")
        t.append(docs.where(col("doc_id") <= cutoff))
        val idx = new java.util.concurrent.atomic.AtomicReference(
          SpanIndex.build(t, s"$dir/index"))
        val refreshes = new java.util.concurrent.atomic.AtomicInteger(0)
        docs.where(col("doc_id") > cutoff)
          .repartition(4).write.parquet(s"$dir/staging")
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/staging")
        val q = graft.streaming.StreamIngest.start(stream, t, s"$dir/ckpt",
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
          onBatch = (tab, _) => {
            val cur = idx.get()
            val next = cur.refresh(tab)
            if (next ne cur) { idx.set(next); refreshes.incrementAndGet(); () }
          })
        q.awaitTermination()
        val expect = docs.select(col("doc_id"), explode(graft.functions.TextFunctions
          .rollingHashes(col("text"), repeatedSpanWindow, repeatedSpanStride)).as("gram_hash"))
        // logical window rows only (the layout also carries `_rowid`)
        val got = idx.get().windows.select("doc_id", "gram_hash")
        val missing = expect.exceptAll(got).count()
        val extra = got.exceptAll(expect).count()
        if (missing != 0 || extra != 0 || refreshes.get() < 2)
          throw new IllegalStateException(
            s"streamed span index diverged: $missing missing / $extra extra window rows, " +
              s"${refreshes.get()} incremental refreshes")
        try Files.write(pointer, dir.toString.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          deleteRecursively(dir) } // racer won; adopt theirs, drop our build
      }
      Files.readString(pointer)
    })

  def prebuildStreamedSpanIndex(s: SparkSession, d: String): Unit = {
    streamedSpanIndexRoot(s, d); ()
  }

  /** Declared `dedup_delta_spans_streamed`: [[deltaSpanStats]]'s exact
    * query against the STREAM-maintained index — a green row proves the
    * micro-batch refresh loop converges to the same stored rows as the
    * batch build (the build itself throws on divergence).
    */
  def deltaSpanStatsStreamed(s: SparkSession, d: String): DataFrame =
    deltaSpanStatsOver(s,
      SpanIndex.open(s, s"${streamedSpanIndexRoot(s, d)}/index").windows,
      deltaCutoff(s, d))

  /** Stream-landed SPAN-GATED corpus, memoized per (machine, sf dir): the
    * documents land in four sequential id-range batches through
    * [[graft.streaming.SpanScrubIngest]] — each batch drops docs whose
    * windows are ≥ [[spanScrubMaxPermille]]‰ covered by spans of
    * already-landed docs, survivors land and the [[SpanIndex]] refreshes.
    */
  private val spanIngestRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def spanIngestRoot(s: SparkSession, d: String): String =
    spanIngestRoots.computeIfAbsent(d, _ => {
      import java.nio.file.{Files, Paths, StandardOpenOption}
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d#span-ingest".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft-rowid-tables")
      Files.createDirectories(base)
      val pointer = base.resolve(s"docs-span-ingest-$key.path")
      if (!Files.exists(pointer)) {
        val dir = base.resolve(s"docs-span-ingest-$key-${java.util.UUID.randomUUID()}")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
        Files.createDirectories(dir.resolve("staging"))
        (0 until 4).foreach { i =>
          val lo = (maxId + 1) * i / 4
          val hi = (maxId + 1) * (i + 1) / 4
          val stage = dir.resolve(s"stage$i")
          docs.where(col("doc_id") >= lo && col("doc_id") < hi)
            .coalesce(1).sortWithinPartitions("doc_id")
            .write.parquet(stage.toString)
          val listing = Files.list(stage)
          var moved = false
          try listing.iterator().forEachRemaining { p =>
            if (p.getFileName.toString.endsWith(".parquet")) {
              Files.move(p, dir.resolve("staging").resolve(f"f$i%02d.parquet"))
              moved = true
            }
          } finally listing.close()
          require(moved, s"stage $i produced no parquet file")
        }
        val t = graft.core.VectorTable.create(s, s"$dir/table")
        val idx = new java.util.concurrent.atomic.AtomicReference(
          SpanIndex.build(t, s"$dir/index"))
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/staging")
        val q = graft.streaming.SpanScrubIngest.start(stream, t, idx,
          spanScrubMaxPermille, s"$dir/ckpt",
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
        q.awaitTermination()
        require(t.length > 0, "span ingest landed nothing")
        try Files.write(pointer, dir.toString.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          deleteRecursively(dir) } // racer won; adopt theirs, drop our build
      }
      Files.readString(pointer)
    })

  def prebuildSpanIngest(s: SparkSession, d: String): Unit = {
    spanIngestRoot(s, d); ()
  }

  /** Declared `dedup_span_ingest`: the landed (doc_id, batch) SET of the
    * span-coverage gate. Because coverage is measured against LANDED docs
    * only (never batch-vs-batch) and the batch boundaries are
    * deterministic id quartiles, the whole four-batch landing is a pure
    * recurrence the oracle replays stage by stage — landed₀ = batch 0,
    * landedₖ = batch k docs whose windows are < threshold‰ covered by
    * spans of ⋃ landed₍₋ₖ₎ — so the gate's exact landed set is
    * value-verified, the strongest contract in the ingest-gate family.
    */
  def spanIngestGate(s: SparkSession, d: String): DataFrame = {
    val root = spanIngestRoot(s, d)
    val maxId = Tables.documents(s, d).agg(max(col("doc_id"))).head.getLong(0)
    val m = maxId + 1
    graft.core.VectorTable.open(s, s"$root/table")
      .scan().select(col("doc_id"))
      .withColumn("batch",
        when(col("doc_id") < m * 1 / 4, 0)
          .when(col("doc_id") < m * 2 / 4, 1)
          .when(col("doc_id") < m * 3 / 4, 2)
          .otherwise(3))
  }

  lazy val spanIngestGateSql: String = {
    val M = graft.functions.ShingleKernel.RollM
    val B = graft.functions.ShingleKernel.RollB
    // landedₖ recurrence unrolled over the four deterministic id-quartile
    // batches; coverage counts window OCCURRENCES whose hash is a span of
    // any already-landed doc (the Spark gate's exact arithmetic)
    def cov(k: Int, prevSpans: String): String =
      s"""c$k AS (
         |  SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup
         |  FROM grams g JOIN nw ON g.doc_id = nw.doc_id AND nw.batch = $k
         |  WHERE g.gram_hash IN (SELECT gram_hash FROM $prevSpans)
         |  GROUP BY g.doc_id),
         | l$k AS (
         |  SELECT nw.doc_id FROM nw LEFT JOIN c$k ON nw.doc_id = c$k.doc_id
         |  WHERE nw.batch = $k AND (nw.n_windows = 0
         |    OR 1000 * COALESCE(c$k.n_dup, 0) // nw.n_windows < $spanScrubMaxPermille)),
         | s$k AS (
         |  SELECT gram_hash FROM $prevSpans
         |  UNION SELECT DISTINCT g.gram_hash FROM grams g JOIN l$k ON g.doc_id = l$k.doc_id)""".stripMargin
    s"""WITH pos AS (
       |  SELECT doc_id, text,
       |    unnest(range(1, len(text) - $repeatedSpanWindow + 2, $repeatedSpanStride)) AS i
       |  FROM documents WHERE len(text) >= $repeatedSpanWindow),
       | grams AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(i, i + $repeatedSpanWindow),
       |                     j -> CAST(ord(text[j]) % 128 AS BIGINT))),
       |      (acc, c) -> (acc * $B + c) % $M) AS gram_hash
       |  FROM pos),
       | b AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
       | nw AS (
       |  SELECT d.doc_id,
       |    CAST(COALESCE(g.cnt, 0) AS BIGINT) AS n_windows,
       |    CASE WHEN d.doc_id < (SELECT m * 1 // 4 FROM b) THEN 0
       |         WHEN d.doc_id < (SELECT m * 2 // 4 FROM b) THEN 1
       |         WHEN d.doc_id < (SELECT m * 3 // 4 FROM b) THEN 2
       |         ELSE 3 END AS batch
       |  FROM documents d LEFT JOIN
       |    (SELECT doc_id, COUNT(*) AS cnt FROM grams GROUP BY doc_id) g
       |    ON d.doc_id = g.doc_id),
       | l0 AS (SELECT doc_id FROM nw WHERE batch = 0),
       | s0 AS (SELECT DISTINCT g.gram_hash FROM grams g JOIN l0 ON g.doc_id = l0.doc_id),
       | ${cov(1, "s0")},
       | ${cov(2, "s1")},
       | ${cov(3, "s2")}
       |SELECT doc_id, 0 AS batch FROM l0
       |UNION ALL SELECT doc_id, 1 FROM l1
       |UNION ALL SELECT doc_id, 2 FROM l2
       |UNION ALL SELECT doc_id, 3 FROM l3""".stripMargin
  }

  /** Stream-landed LEXICALLY-GATED corpus, memoized per (machine, sf dir):
    * the documents land in four sequential id-range batches through
    * [[graft.streaming.LshDedupIngest]] — each batch drops docs that band
    * against the committed [[LshIndex]] AND verify as Jaccard ≥ 1/2
    * near-dups of an already-landed doc; survivors land and the index
    * refreshes (only the appended span is signature-hashed).
    */
  private val lshIngestRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def lshIngestRoot(s: SparkSession, d: String): String =
    lshIngestRoots.computeIfAbsent(d, _ => {
      import java.nio.file.{Files, Paths, StandardOpenOption}
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d#lsh-ingest".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft-rowid-tables")
      Files.createDirectories(base)
      val pointer = base.resolve(s"docs-lsh-ingest-$key.path")
      if (!Files.exists(pointer)) {
        val dir = base.resolve(s"docs-lsh-ingest-$key-${java.util.UUID.randomUUID()}")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
        Files.createDirectories(dir.resolve("staging"))
        (0 until 4).foreach { i =>
          val lo = (maxId + 1) * i / 4
          val hi = (maxId + 1) * (i + 1) / 4
          val stage = dir.resolve(s"stage$i")
          docs.where(col("doc_id") >= lo && col("doc_id") < hi)
            .coalesce(1).sortWithinPartitions("doc_id")
            .write.parquet(stage.toString)
          val listing = Files.list(stage)
          var moved = false
          try listing.iterator().forEachRemaining { p =>
            if (p.getFileName.toString.endsWith(".parquet")) {
              Files.move(p, dir.resolve("staging").resolve(f"f$i%02d.parquet"))
              moved = true
            }
          } finally listing.close()
          require(moved, s"stage $i produced no parquet file")
        }
        val t = graft.core.VectorTable.create(s, s"$dir/table")
        val idx = new java.util.concurrent.atomic.AtomicReference(
          LshIndex.build(t, s"$dir/index"))
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/staging")
        val q = graft.streaming.LshDedupIngest.start(stream, t, idx,
          s"$dir/ckpt",
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
        q.awaitTermination()
        require(t.length > 0, "lsh ingest landed nothing")
        try Files.write(pointer, dir.toString.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          deleteRecursively(dir) } // racer won; adopt theirs, drop our build
      }
      Files.readString(pointer)
    })

  def prebuildLshIngest(s: SparkSession, d: String): Unit = {
    lshIngestRoot(s, d); ()
  }

  /** Declared `dedup_lsh_ingest`: the landed (doc_id, batch) SET of the
    * lexical (MinHash-LSH + Jaccard-verified) ingest gate. Because
    * near-dups are measured against LANDED docs only (never batch-vs-batch)
    * and the batch boundaries are deterministic id quartiles, the whole
    * four-batch landing is a pure recurrence the oracle replays stage by
    * stage — landed₀ = batch 0, landedₖ = batch k docs with NO verified
    * near-dup pair into ⋃ landed₍<ₖ₎ — over the SAME verified-pair set as
    * `dedup_jaccard_verified` (banding collisions and Jaccard are
    * symmetric, deterministic functions of the two texts, so the gate's
    * bipartite candidates against stored band rows coincide with the
    * all-docs pair set restricted to (landed, batch) pairs). The landed
    * set is value-verified exactly — the same strongest-contract gate as
    * `dedup_span_ingest`.
    */
  def lshIngestGate(s: SparkSession, d: String): DataFrame = {
    val root = lshIngestRoot(s, d)
    val maxId = Tables.documents(s, d).agg(max(col("doc_id"))).head.getLong(0)
    val m = maxId + 1
    graft.core.VectorTable.open(s, s"$root/table")
      .scan().select(col("doc_id"))
      .withColumn("batch",
        when(col("doc_id") < m * 1 / 4, 0)
          .when(col("doc_id") < m * 2 / 4, 1)
          .when(col("doc_id") < m * 3 / 4, 2)
          .otherwise(3))
  }

  lazy val lshIngestGateSql: String = {
    // landedₖ recurrence unrolled over the four deterministic id-quartile
    // batches, over the verified near-dup pair set of the whole corpus
    // (doc_a < doc_b — the committed side of every gate-checked pair is
    // always the smaller id under ordered arrival)
    def step(k: Int, prev: String): String =
      s"""l$k AS (
         |  SELECT d.doc_id FROM d
         |  WHERE d.batch = $k AND NOT EXISTS (
         |    SELECT 1 FROM v JOIN $prev p ON v.doc_a = p.doc_id
         |    WHERE v.doc_b = d.doc_id)),
         | s$k AS (SELECT doc_id FROM $prev UNION ALL SELECT doc_id FROM l$k)""".stripMargin
    s"""WITH v AS (${jaccardVerifiedPairsSql.replace("\n", "\n  ")}),
       | b AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
       | d AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id < (SELECT m * 1 // 4 FROM b) THEN 0
       |         WHEN doc_id < (SELECT m * 2 // 4 FROM b) THEN 1
       |         WHEN doc_id < (SELECT m * 3 // 4 FROM b) THEN 2
       |         ELSE 3 END AS batch
       |  FROM documents),
       | l0 AS (SELECT doc_id FROM d WHERE batch = 0),
       | s0 AS (SELECT doc_id FROM l0),
       | ${step(1, "s0")},
       | ${step(2, "s1")},
       | ${step(3, "s2")}
       |SELECT doc_id, 0 AS batch FROM l0
       |UNION ALL SELECT doc_id, 1 FROM l1
       |UNION ALL SELECT doc_id, 2 FROM l2
       |UNION ALL SELECT doc_id, 3 FROM l3""".stripMargin
  }

  /** Declared `dedup_delta_spans`: per corpus drop, the repeated-span scan
    * scoped to spans TOUCHING THE DELTA, from the persisted [[SpanIndex]] —
    * the exact-substring modality joining the MinHash / SimHash /
    * containment / semantic delta family. Delta window hashes semi-join
    * the stored rows, so only hash groups containing a delta occurrence
    * are aggregated — work is keyed by the DELTA's hash set, never a full
    * re-scan of document text (the plan touches only index parquet; the
    * counts per touched span cover the WHOLE corpus, committed + delta,
    * which is exactly what a memorization audit of newly-ingested data
    * needs). Oracle: the full rolling-hash recompute from raw text
    * filtered to delta-touching spans — a green row proves the
    * incremental index and the delta join lose nothing vs re-hashing
    * everything.
    */
  def deltaSpanStats(s: SparkSession, d: String): DataFrame =
    deltaSpanStatsOver(s,
      SpanIndex.open(s, s"${spanIndexRoot(s, d)}/index").windows,
      deltaCutoff(s, d))

  private def deltaSpanStatsOver(s: SparkSession, idx: DataFrame,
                                 cutoff: Long): DataFrame = {
    val deltaHashes = idx.where(col("doc_id") > cutoff)
      .select("gram_hash").distinct()
    idx.join(deltaHashes, Seq("gram_hash"), "left_semi")
      .groupBy("gram_hash")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("first_doc"))
      .where(col("n_docs") >= repeatedSpanMinDocs)
      .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("gram_hash"))
      .limit(repeatedSpanTopK)
  }

  lazy val deltaSpanStatsSql: String = {
    val M = graft.functions.ShingleKernel.RollM
    val B = graft.functions.ShingleKernel.RollB
    s"""WITH pos AS (
       |  SELECT doc_id, text,
       |    unnest(range(1, len(text) - $repeatedSpanWindow + 2, $repeatedSpanStride)) AS i
       |  FROM documents WHERE len(text) >= $repeatedSpanWindow),
       | grams AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(i, i + $repeatedSpanWindow),
       |                     j -> CAST(ord(text[j]) % 128 AS BIGINT))),
       |      (acc, c) -> (acc * $B + c) % $M) AS gram_hash
       |  FROM pos),
       | cut AS (SELECT MAX(doc_id) // 2 AS c FROM documents),
       | touched AS (
       |  SELECT DISTINCT gram_hash FROM grams WHERE doc_id > (SELECT c FROM cut))
       |SELECT g.gram_hash, COUNT(DISTINCT g.doc_id) AS n_docs,
       |  COUNT(*) AS n_occurrences, MIN(g.doc_id) AS first_doc
       |FROM grams g JOIN touched t ON g.gram_hash = t.gram_hash
       |GROUP BY g.gram_hash HAVING COUNT(DISTINCT g.doc_id) >= $repeatedSpanMinDocs
       |ORDER BY n_docs DESC, n_occurrences DESC, g.gram_hash
       |LIMIT $repeatedSpanTopK""".stripMargin
  }

  /** Two-stage [[ContainmentIndex]] build, memoized like the others. The
    * second-half refresh sorts under the FIRST half's frozen frequency
    * order — exactly the drift the lossless-under-any-consistent-order
    * argument covers, and exactly what the oracle's order-free all-pairs
    * SQL verifies end-to-end.
    */
  private val containmentIndexRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def containmentIndexRoot(s: SparkSession, d: String): String =
    containmentIndexRoots.computeIfAbsent(d, _ => {
      import java.nio.file.{Files, Paths, StandardOpenOption}
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d#containment".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft-rowid-tables")
      Files.createDirectories(base)
      val pointer = base.resolve(s"docs-contain-$key.path")
      if (!Files.exists(pointer)) {
        val dir = base.resolve(s"docs-contain-$key-${java.util.UUID.randomUUID()}")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val cutoff = docs.agg(max(col("doc_id"))).head.getLong(0) / 2
        val t = graft.core.VectorTable.create(s, s"$dir/table")
        t.append(docs.where(col("doc_id") <= cutoff))
        val idx = ContainmentIndex.build(t, s"$dir/index")
        t.append(docs.where(col("doc_id") > cutoff))
        idx.refresh(t)
        try Files.write(pointer, dir.toString.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          deleteRecursively(dir) } // racer won; adopt theirs, drop our build
      }
      Files.readString(pointer)
    })

  def prebuildContainmentIndex(s: SparkSession, d: String): Unit = {
    containmentIndexRoot(s, d); ()
  }

  /** Declared `dedup_delta_containment`: per corpus drop, EXACT containment
    * pairs TOUCHING THE DELTA from the persisted prefix index. Two blocked
    * bipartite arms cover both probe directions without overlap (probe side
    * is always the strictly smaller set, ties by doc_id): delta prefixes ×
    * all elements catches pairs whose SMALLER side is new, old prefixes ×
    * delta elements catches pairs whose smaller side is old — so no pair
    * dedup exchange is needed across arms. All lists come pre-sorted under
    * the index's frozen order (both sides of every comparison — the
    * losslessness requirement); verification merges the stored ASC sets.
    * Oracle: the order-free all-pairs containment SQL filtered to
    * delta-touching pairs.
    */
  def deltaContainmentPairs(s: SparkSession, d: String): DataFrame = {
    val root = containmentIndexRoot(s, d)
    // no checkpoint: stored rows are the materialization (see
    // deltaSimhashPairs) and the plan pin needs visible parquet scans
    deltaContainmentPairsFrom(
      ContainmentIndex.open(s, s"$root/index").entries, deltaCutoff(s, d))
  }

  /** Both blocked bipartite arms + merge-count verification over any
    * stored entries frame — shared by the plain face above and its
    * compacted twin.
    */
  private def deltaContainmentPairsFrom(entries: DataFrame, cutoff: Long): DataFrame = {
    val sorted = entries.select("doc_id", "sg", "n")
    val cands = containmentCandidatesBetween(sorted.where(col("doc_id") > cutoff), sorted)
      .unionAll(containmentCandidatesBetween(
        sorted.where(col("doc_id") <= cutoff), sorted.where(col("doc_id") > cutoff)))
    cands
      .join(entries.select(col("doc_id").as("doc_a"), col("sh").as("sa")), Seq("doc_a"))
      .join(entries.select(col("doc_id").as("doc_b"), col("sh").as("sb")), Seq("doc_b"))
      .withColumn("inter", graft.functions.TextFunctions
        .sortedIntersectCount(col("sa"), col("sb")).cast("long"))
      .withColumn("n_min", least(size(col("sa")), size(col("sb"))).cast("long"))
      .where(col("inter") * containTauDen >= col("n_min") * containTauNum)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("n_min"),
        (col("inter").cast("double") / col("n_min").cast("double")).as("containment"))
  }

  lazy val deltaContainmentPairsSql: String =
    s"""WITH p AS (${containmentPairsSql.replace("\n", "\n  ")}),
       | cut AS (SELECT MAX(doc_id) // 2 AS c FROM documents)
       |SELECT doc_a, doc_b, inter, n_min, containment FROM p
       |WHERE doc_a > (SELECT c FROM cut) OR doc_b > (SELECT c FROM cut)""".stripMargin

  // ----- round-15: post-compaction identity faces -----------------------
  // Every delta face re-run against a COMPACTED twin of its persisted
  // index, with the SAME full-recompute oracle — a green row per modality
  // is the proof that [[IndexCompaction]] (which collapses the
  // refresh-fragmented live dir to the byte-sized file target behind an
  // atomic pointer flip) changes the file layout and NOTHING else. The
  // twin is its own memoized two-stage build (build on the first doc_id
  // half, refresh with the second — the exact maintenance history of the
  // plain index — then compact, with the fragmentation REQUIRED before
  // and the collapse REQUIRED after, the same contract as
  // [[Similarity.compactedIvfRoot]]). Compacting the SHARED index in the
  // face itself would race the plain face reading it on Verify's query
  // thread pool — the old dir is deleted after the pointer flip.

  private val compactedDeltaRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def compactedDeltaIndexRoot[I](
      s: SparkSession, d: String, tag: String,
      build: (graft.core.VectorTable, String) => I,
      refresh: (I, graft.core.VectorTable) => I,
      compactIt: I => Unit): String =
    compactedDeltaRoots.computeIfAbsent(s"$d#$tag", _ => {
      import java.nio.file.{Files, Paths, StandardOpenOption}
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d#delta-compacted#$tag".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft-rowid-tables")
      Files.createDirectories(base)
      val pointer = base.resolve(s"docs-compacted-$tag-$key.path")
      if (!Files.exists(pointer)) {
        val dir = base.resolve(s"docs-compacted-$tag-$key-${java.util.UUID.randomUUID()}")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val cutoff = docs.agg(max(col("doc_id"))).head.getLong(0) / 2
        val t = graft.core.VectorTable.create(s, s"$dir/table")
        t.append(docs.where(col("doc_id") <= cutoff))
        var idx = build(t, s"$dir/index")
        t.append(docs.where(col("doc_id") > cutoff))
        idx = refresh(idx, t)
        val pre = IndexCompaction.liveFileCount(s"$dir/index")
        require(pre > 1,
          s"$tag: the two-stage build must fragment the layout before " +
            "compaction prices anything")
        compactIt(idx)
        val post = IndexCompaction.liveFileCount(s"$dir/index")
        require(post < pre,
          s"$tag: compaction must shrink the file count ($pre -> $post)")
        try Files.write(pointer, dir.toString.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          deleteRecursively(dir) } // racer won; adopt theirs, drop our build
      }
      Files.readString(pointer)
    })

  /** One-time landing of all four compacted twin indexes, priced as its
    * own bench dim so the compacted query faces report the WARM gate.
    */
  def prebuildCompactedDeltaIndexes(s: SparkSession, d: String): Unit = {
    compactedDeltaIndexRoot[LshIndex](s, d, "lsh",
      (t, r) => LshIndex.build(t, r), (i, t) => i.refresh(t), i => { i.compact(); () })
    compactedDeltaIndexRoot[SimHashIndex](s, d, "simhash",
      (t, r) => SimHashIndex.build(t, r), (i, t) => i.refresh(t), i => { i.compact(); () })
    compactedDeltaIndexRoot[ContainmentIndex](s, d, "containment",
      (t, r) => ContainmentIndex.build(t, r), (i, t) => i.refresh(t), i => { i.compact(); () })
    compactedDeltaIndexRoot[SpanIndex](s, d, "span",
      (t, r) => SpanIndex.build(t, r), (i, t) => i.refresh(t), i => { i.compact(); () })
    ()
  }

  /** Declared `dedup_delta_candidates_compacted`. */
  def deltaCandidatePairsCompacted(s: SparkSession, d: String): DataFrame = {
    val root = compactedDeltaIndexRoot[LshIndex](s, d, "lsh",
      (t, r) => LshIndex.build(t, r), (i, t) => i.refresh(t), i => { i.compact(); () })
    deltaCandidatesFromBands(
      LshIndex.open(s, s"$root/index").bands, deltaCutoff(s, d),
      Some(s"dcb:$root"))
  }

  lazy val deltaCandidatePairsCompactedSql: String = deltaCandidatePairsSql

  /** Declared `dedup_delta_simhash_compacted`. */
  def deltaSimhashPairsCompacted(s: SparkSession, d: String): DataFrame = {
    val root = compactedDeltaIndexRoot[SimHashIndex](s, d, "simhash",
      (t, r) => SimHashIndex.build(t, r), (i, t) => i.refresh(t), i => { i.compact(); () })
    deltaSimhashPairsFrom(
      SimHashIndex.open(s, s"$root/index").signatures, deltaCutoff(s, d),
      Some(s"dsh:$root"))
  }

  lazy val deltaSimhashPairsCompactedSql: String = deltaSimhashPairsSql

  /** Declared `dedup_delta_containment_compacted`. */
  def deltaContainmentPairsCompacted(s: SparkSession, d: String): DataFrame = {
    val root = compactedDeltaIndexRoot[ContainmentIndex](s, d, "containment",
      (t, r) => ContainmentIndex.build(t, r), (i, t) => i.refresh(t), i => { i.compact(); () })
    deltaContainmentPairsFrom(
      ContainmentIndex.open(s, s"$root/index").entries, deltaCutoff(s, d))
  }

  lazy val deltaContainmentPairsCompactedSql: String = deltaContainmentPairsSql

  /** TAKEDOWN over the lexical index (round 15): documents land in two
    * spans (build + refresh — the incremental history), then the VICTIM
    * SET — every doc that appears as the smaller (`doc_a`) side of a
    * full-corpus LSH candidate pair with an even id — is deleted
    * ([[graft.core.VectorTable.deleteWhere]]) and ONE refresh propagates
    * the mask into the [[LshIndex]] via the file-granular
    * [[IndexCompaction.applyDeletesFiles]] (only files containing masked
    * ids are rewritten; the rest hard-link). The victims are chosen FROM
    * the pair set deliberately: deleting ids that never collide would
    * leave the face unable to distinguish a stale index from a scrubbed
    * one (measured at sf0.01: a plain modulo predicate touches zero
    * pairs). Memoized per (machine, sf dir) behind the pointer protocol.
    */
  private val takedownLshRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def takedownLshRoot(s: SparkSession, d: String): String =
    takedownLshRoots.computeIfAbsent(d, _ => {
      import java.nio.file.{Files, Paths, StandardOpenOption}
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d#lsh-takedown".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft-rowid-tables")
      Files.createDirectories(base)
      val pointer = base.resolve(s"docs-lsh-takedown-$key.path")
      if (!Files.exists(pointer)) {
        val dir = base.resolve(s"docs-lsh-takedown-$key-${java.util.UUID.randomUUID()}")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val cutoff = docs.agg(max(col("doc_id"))).head.getLong(0) / 2
        val t = graft.core.VectorTable.create(s, s"$dir/table")
        t.append(docs.where(col("doc_id") <= cutoff))
        var idx = LshIndex.build(t, s"$dir/index")
        t.append(docs.where(col("doc_id") > cutoff))
        idx = idx.refresh(t)
        val victims = pairsFromBands(idx.bands)
          .where(col("doc_a") % 2 === 0)
          .select(col("doc_a")).distinct()
          .collect().map(_.getLong(0))
        require(victims.nonEmpty, "lsh takedown face needs colliding victims")
        val deleted = t.deleteWhere(col("doc_id").isin(victims: _*))
        require(deleted == victims.length.toLong,
          "every victim must be a live doc")
        idx = idx.refresh(t)
        require(idx.indexedMask == deleted, "refresh must record the applied mask")
        try Files.write(pointer, dir.toString.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          deleteRecursively(dir) } // racer won; adopt theirs, drop our build
      }
      Files.readString(pointer)
    })

  def prebuildTakedownLsh(s: SparkSession, d: String): Unit = {
    takedownLshRoot(s, d); ()
  }

  /** Declared `takedown_lsh_delta`: [[deltaCandidatePairs]]'s exact query
    * over the POST-TAKEDOWN index — the oracle recomputes the whole
    * banding pipeline from only the SURVIVING documents, so a green row
    * proves the file-granular invalidation removed every deleted doc's
    * band rows and nothing else (a stale band row would surface a
    * candidate pair the oracle cannot produce).
    */
  def takedownLshDelta(s: SparkSession, d: String): DataFrame = {
    val root = takedownLshRoot(s, d)
    // cutoff is INPUT metadata of the immutable post-takedown fixture
    // (one max over its live view), session-memoized exactly like
    // [[deltaCutoff]] — the per-invocation scan job was pure re-derivation
    val sid = ensureEvictionListener(s)
    val cutoff = deltaCutoffCache.computeIfAbsent(sid + ":tdlsh:" + root,
      _ => graft.core.VectorTable.open(s, s"$root/table")
        .liveScan().agg(max(col("doc_id"))).head.getLong(0) / 2)
    deltaCandidatesFromBands(LshIndex.open(s, s"$root/index").bands, cutoff,
      Some(s"dcb:$root"))
  }

  lazy val takedownLshDeltaSql: String = {
    // victims from the FULL corpus's pair set (the pre-delete index holds
    // all docs' bands — banding is deterministic, so recomputing from all
    // docs reproduces it); then the delta pipeline recomputed from only
    // the surviving documents
    val inner = deltaCandidatePairsSql.replace("FROM documents",
      "FROM (SELECT * FROM documents WHERE doc_id NOT IN " +
        "(SELECT doc_a FROM victims)) AS documents")
    require(inner.startsWith("WITH "), "delta SQL must be a WITH query")
    s"""WITH fp0 AS (${lshCandidatePairsSql.replace("\n", "\n  ")}),
       | victims AS (SELECT DISTINCT doc_a FROM fp0 WHERE doc_a % 2 = 0),
       | ${inner.drop("WITH ".length)}""".stripMargin
  }

  /** Declared `dedup_delta_spans_compacted`. */
  def deltaSpanStatsCompacted(s: SparkSession, d: String): DataFrame = {
    val root = compactedDeltaIndexRoot[SpanIndex](s, d, "span",
      (t, r) => SpanIndex.build(t, r), (i, t) => i.refresh(t), i => { i.compact(); () })
    deltaSpanStatsOver(s,
      SpanIndex.open(s, s"$root/index").windows, deltaCutoff(s, d))
  }

  lazy val deltaSpanStatsCompactedSql: String = deltaSpanStatsSql

  val lshCandidatePairsSql: String = {
    val bandRows = (0 until numHashes / 2)
      .map(b => s"SELECT doc_id, $b AS band, mh${2 * b} AS h1, mh${2 * b + 1} AS h2 FROM sig")
      .mkString("\n  UNION ALL ")
    s"""WITH sig AS (${minhashSignaturesSql}),
       | bands AS (${bandRows})
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.doc_id < b.doc_id""".stripMargin
  }

  /** Near-dup verification: exact Jaccard over distinct shingle sets, but
    * only for LSH candidate pairs (the scalable pattern: candidates are
    * O(bucket), verification is O(candidates)).
    */
  def jaccardVerifiedPairs(s: SparkSession, d: String): DataFrame =
    jaccardVerifiedPairsOf(Tables.documents(s, d), Some(s"bpa:$d:k$numHashes"))

  private[graft] def jaccardVerifiedPairsOf(docs: DataFrame,
                                            gateKey: Option[String] = None): DataFrame = {
    // Materialized once: the candidate set feeds three consumers (the id
    // projection below + both verification joins); without the checkpoint
    // the signature→banding chain re-executes per consumer. Candidates go
    // through the adaptive collapse — identical pair set, clique-safe plan.
    val pairs = bandedPairsAdaptive(signaturesOf(docs),
      bandsOf, Seq("band", "h1", "h2"), gateKey).localCheckpoint()
    jaccardVerifyCandidates(docs, pairs)
  }

  /** Verification body over a PREBUILT (checkpointed) candidate-pair frame
    * — split out (round-18 optimization) so the report funnels can count
    * the candidate stage and feed verification from ONE materialization
    * instead of running the signature→banding chain twice per funnel.
    */
  private[operators] def jaccardVerifyCandidates(docs: DataFrame,
                                                 pairs: DataFrame): DataFrame = {
    // Verification work is sized to the CANDIDATES, not the corpus: only
    // docs that appear in some LSH pair need their shingle set, so a
    // semi-join prunes the corpus before the (expensive) shingle-hash
    // kernel runs — at scale |candidates| << |docs| and this is the
    // difference between a full-corpus pass and a near-free one.
    val candidateIds = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    // Jaccard over distinct *hashed* shingle sets (52-bit md5-derived ints,
    // the same family the signatures use): set ops on bigint arrays instead
    // of 3-word strings — less shuffle weight, same verified pairs, and the
    // oracle recomputes identical hash sets in SQL.
    val docsWithShingles = docs
      .join(candidateIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), graft.functions.TextFunctions.shingleHashes(col("text")).as("sh"))
      .localCheckpoint()
    pairs
      .join(docsWithShingles.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sa"), "doc_a")
      .join(docsWithShingles.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sb"), "doc_b")
      // fused merge-count over the sorted-distinct hash sets (≡
      // size(array_intersect), no per-pair allocation)
      .withColumn("inter", graft.functions.TextFunctions
        .sortedIntersectCount(col("sa"), col("sb")))
      .withColumn("uni", expr("size(sa) + size(sb) - inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .where(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "inter", "uni", "jaccard")
  }

  val jaccardVerifiedPairsSql: String =
    s"""WITH pairs AS (${lshCandidatePairsSql}),
       | sh AS (SELECT doc_id,
       |          list_distinct(list_transform($shingleSqlExpr,
       |            g -> ('0x' || substr(md5(g), 1, 13))::BIGINT)) AS hs
       |        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
       | j AS (SELECT p.doc_a, p.doc_b,
       |         len(list_filter(sa.hs, g -> list_contains(sb.hs, g))) AS inter,
       |         len(sa.hs) + len(sb.hs)
       |           - len(list_filter(sa.hs, g -> list_contains(sb.hs, g))) AS uni
       |       FROM pairs p
       |        JOIN sh sa ON sa.doc_id = p.doc_a
       |        JOIN sh sb ON sb.doc_id = p.doc_b)
       |SELECT doc_a, doc_b, inter, uni,
       |  CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
       |FROM j WHERE CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) >= 0.5""".stripMargin

  /** EXACT containment join: ALL pairs with max-containment
    * = |A∩B| / min(|A|,|B|) ≥ 3/4 — the ASYMMETRIC near-dup test Jaccard
    * structurally misses: a short document quoted wholesale inside a long
    * one has containment ≈ 1 but Jaccard ≈ |short|/|long| (arbitrarily
    * small), and quote/subset duplication is its own leakage channel in
    * training corpora.
    *
    * Candidate generation is containment-appropriate (NOT the Jaccard LSH
    * bands, whose per-band collision probability J^r is structurally near
    * zero for exactly the high-containment/low-Jaccard pairs this operator
    * exists for): an asymmetric prefix filter on the SMALLER side. With
    * both shingle lists sorted by one global rarest-first order, a pair
    * with |A| ≤ |B| and inter ≥ req = ⌈τ·|A|⌉ must match one of A's first
    * |A| − req + 1 elements somewhere in B (else inter ≤ |A| − plen <
    * req) — so probing A's prefix against a full index of B's elements is
    * LOSSLESS, and the positional bound min(p_a,p_b) + min(n_a−p_a,
    * n_b−p_b) ≥ req prunes further (same PPJoin arithmetic as
    * [[exactJaccardCandidatesOf]], with the asymmetric threshold).
    * Rarest-first ordering keeps frequent shingles out of probe prefixes,
    * so hot index buckets meet few probe rows; candidates stay
    * occupancy-sized, never |docs|². Verification runs the fused
    * [[graft.functions.SortedIntersectCount]] merge kernel on the
    * canonical sorted lists; the threshold stays in integer arithmetic
    * (4·inter ≥ 3·min) so no float boundary can drop a pair differently
    * across engines. Because every pruning step is lossless, the oracle
    * can verify the SAME result with a plain all-pairs join — recall is
    * exact by construction, not relative to a shared candidate set.
    */
  val containTauNum = 3
  val containTauDen = 4

  def containmentPairs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), graft.functions.TextFunctions.shingleHashes(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
      .localCheckpoint()
    containmentJoinOf(docs, Some(s"cont:$d"))
  }

  /** Adaptive entry: the containment join takes the same EXACT-SET
    * COLLAPSE as the Jaccard join on clique-shaped duplication — the final
    * result is a function of the shingle sets alone (every pruning step is
    * lossless under ANY consistent frequency order, including the
    * rep-frame's own), so the prefix machinery runs on one representative
    * per distinct set: intra-group pairs are containment 1 by definition
    * (inter = n_min = n), cross pairs lift the rep pair's (inter, n_min,
    * containment) verbatim. Same fingerprint keys, pre-gate and shape rule
    * as [[exactJaccardJoinOf]]; ContainmentJoinSpec pins collapsed ≡ flat.
    * Precondition (callers enforce): rows have size(sh) > 0 — identical
    * EMPTY sets must not form intra pairs, matching the flat join, which
    * structurally emits nothing for them.
    */
  private[operators] def containmentJoinOf(docs: DataFrame,
                                           gateKey: Option[String] = None): DataFrame =
    if (lowDupPreGateMemo(gateKey, docs, xxhash64(col("sh")))) containmentJoinFlat(docs)
    else {
      val keyed = fpKeyed(docs, col("sh"))
      val groups = groupFrame(keyed, Seq("f1", "f2"))
      val (n, maxg, intra) = groupShapeStats(groups)
      if (!shouldCollapse(n, maxg, intra)) containmentJoinFlat(docs)
      else containmentJoinCollapsedWith(docs, keyed, groups.localCheckpoint())
    }

  /** Forced collapse body (spec-pinnable below the adaptive threshold). */
  private[operators] def containmentJoinCollapsed(docs: DataFrame): DataFrame = {
    val keyed = fpKeyed(docs, col("sh"))
    containmentJoinCollapsedWith(docs, keyed,
      groupFrame(keyed, Seq("f1", "f2")).localCheckpoint())
  }

  private def containmentJoinCollapsedWith(docs: DataFrame, keyed: DataFrame,
                                           groups: DataFrame): DataFrame = {
    val membership = keyed.join(groups, Seq("f1", "f2"))
      .select(col("gid"), col("doc_id"), col("gsize"))
      .localCheckpoint()
    val repPairs = containmentJoinFlat(
      docs.join(groups.select(col("gid").as("doc_id")), Seq("doc_id"), "left_semi"))
    val intraPairs = pairsFromBucketedRowsRaw(
      membership.where(col("gsize") > 1).select(col("gid"), col("doc_id")),
      Seq("gid"), bucketExpandCap)
      .join(docs.select(col("doc_id").as("doc_a"), size(col("sh")).cast("long").as("n")),
        Seq("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("n").as("inter"), col("n").as("n_min"),
        lit(1.0).as("containment"))
    val crossPairs = repPairs
      .join(membership.select(col("gid").as("doc_a"), col("doc_id").as("da")), Seq("doc_a"))
      .join(membership.select(col("gid").as("doc_b"), col("doc_id").as("db")), Seq("doc_b"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"),
        col("inter"), col("n_min"), col("containment"))
    intraPairs.unionAll(crossPairs)
  }

  private[operators] def containmentJoinFlat(docs: DataFrame): DataFrame = {
    val cands = containmentCandidatesOf(docs)
    cands
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sa")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sb")), Seq("doc_b"))
      .withColumn("inter", graft.functions.TextFunctions
        .sortedIntersectCount(col("sa"), col("sb")).cast("long"))
      .withColumn("n_min", least(size(col("sa")), size(col("sb"))).cast("long"))
      .where(col("inter") * containTauDen >= col("n_min") * containTauNum)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("n_min"),
        (col("inter").cast("double") / col("n_min").cast("double")).as("containment"))
  }

  /** Asymmetric prefix-filter candidates for [[containmentJoinOf]]:
    * probe = each doc's rarest-first prefix (plen = n − ⌈τ·n⌉ + 1),
    * index = every element of every doc; join on the shingle, direction
    * fixed to probe-side-smaller (ties by doc_id), positional bound
    * aggregated min-over-buckets. Exposed separately so ScaleProbe can
    * measure candidate growth.
    */
  private[operators] def containmentCandidatesOf(docs: DataFrame): DataFrame = {
    // checkpointed: probe, index AND the occupancy counts all derive from
    // it — without this the freq-join-sort chain re-executes per consumer
    val sorted = sortedByRarity(docs).localCheckpoint()
    containmentCandidatesBetween(sorted, sorted)
  }

  /** Per-doc element lists in rarest-first order over the given frame's
    * own frequencies — the self-join form; the DELTA face instead reads
    * lists pre-sorted under the [[ContainmentIndex]]'s frozen order.
    */
  private[operators] def sortedByRarity(docs: DataFrame): DataFrame = {
    val freq = docs.select(explode(col("sh")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
    docs.select(col("doc_id"), explode(col("sh")).as("g"))
      .join(freq, Seq("g"))
      .groupBy("doc_id")
      .agg(expr("transform(array_sort(collect_list(struct(cnt, g))), x -> x.g)").as("sg"))
      .withColumn("n", size(col("sg")))
  }

  /** The prefix-probe × element-index join over EXPLICIT (doc_id, sg, n)
    * frames, both sorted under one shared total order: probe side explodes
    * rarest-first prefixes, index side full element lists, direction fixed
    * to probe-side-smaller. The self case passes the same frame twice; the
    * delta face passes (delta, all) and (old, delta) arms. Occupancy for
    * the blocked slicing is computed per side from the frames themselves
    * (a subset index side must slice on ITS counts, not corpus frequency).
    */
  private[operators] def containmentCandidatesBetween(probeSorted: DataFrame,
                                                      indexSorted: DataFrame): DataFrame = {
    val probe = probeSorted
      .withColumn("req", expr(
        s"CAST((n * $containTauNum + ${containTauDen - 1}) DIV $containTauDen AS INT)"))
      .withColumn("plen", col("n") - col("req") + lit(1))
      .select(col("doc_id").as("da"), col("n").as("na"), col("req"),
        posexplode(expr("slice(sg, 1, plen)")).as(Seq("p0a", "g")))
      .withColumn("pa", col("p0a") + 1).drop("p0a")
    val index = indexSorted
      .select(col("doc_id").as("db"), col("n").as("nb"),
        posexplode(col("sg")).as(Seq("p0b", "g")))
      .withColumn("pb", col("p0b") + 1).drop("p0b")
    val freq = index.groupBy("g").agg(count(lit(1)).as("cnt"))
    // BLOCKED bipartite probe×index join (the [[pairsFromBucketedRows]]
    // discipline for a two-sided join): per element g, slice the index
    // side into nsi = ⌈|index rows|/cap⌉ hash slices and the probe side
    // into nsp = ⌈|probe rows|/cap⌉, replicate each row across the OTHER
    // side's slice ids, and join on (g, sa, sb) — every task's output is
    // ~cap² pair rows, so a 10⁴-copy boilerplate clique (every copy's
    // rare prefix element in the same bucket) streams through uniformly
    // small tasks instead of funneling B² payload rows into the few tasks
    // owning one g (the measured partial-agg OOM shape). Replication cost
    // is output/cap per side — strictly cheaper than the join output.
    // Cold elements (occupancy ≤ cap) have one slice on both sides: no
    // replication, the plan the round-10 verdict audited.
    val pcnt = probe.groupBy("g").agg(count(lit(1)).as("np"))
    val slices = freq
      .select(col("g"), ceil(col("cnt").cast("double") / bucketExpandCap).cast("int").as("nsi"))
      .join(pcnt.select(col("g"),
        ceil(col("np").cast("double") / bucketExpandCap).cast("int").as("nsp")), Seq("g"))
    val probeS = probe.join(slices, Seq("g"))
      .withColumn("sa", pmod(xxhash64(col("da")), col("nsp").cast("long")).cast("int"))
      .withColumn("sb", explode(sequence(lit(0), col("nsi") - 1)))
      .drop("nsp", "nsi")
    val indexS = index.join(slices, Seq("g"))
      .withColumn("sb", pmod(xxhash64(col("db")), col("nsi").cast("long")).cast("int"))
      .withColumn("sa", explode(sequence(lit(0), col("nsp") - 1)))
      .drop("nsp", "nsi")
    // pair reduction via the sorted window (min-over-shared-elements as
    // "order by ub, keep row 1") — same spill-safe shape as
    // [[exactJaccardCandidatesOf]]'s reduction, see [[pairDistinct]]
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("da", "db").orderBy("ub")
    probeS.join(indexS, Seq("g", "sa", "sb"))
      .where(col("na") < col("nb") || (col("na") === col("nb") && col("da") < col("db")))
      .withColumn("ub",
        least(col("pa"), col("pb")) + least(col("na") - col("pa"), col("nb") - col("pb")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .where(col("ub") >= col("req"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"))
  }

  /** Oracle: plain all-pairs verification — legitimate BECAUSE the Spark
    * side's pruning is lossless (identical final rows), and tractable for
    * DuckDB at gate scale.
    */
  val containmentPairsSql: String =
    s"""WITH sh AS (SELECT doc_id,
       |          list_distinct(list_transform($shingleSqlExpr,
       |            g -> ('0x' || substr(md5(g), 1, 13))::BIGINT)) AS hs
       |        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
       | nz AS (SELECT * FROM sh WHERE len(hs) > 0),
       | j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS inter,
       |         CAST(least(len(a.hs), len(b.hs)) AS BIGINT) AS n_min
       |       FROM nz a JOIN nz b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, inter, n_min,
       |  CAST(inter AS DOUBLE) / CAST(n_min AS DOUBLE) AS containment
       |FROM j WHERE inter * $containTauDen >= n_min * $containTauNum""".stripMargin

  /** Duplicate clusters: connected components over the verified near-dup
    * pairs via min-label propagation — the step that turns pairwise matches
    * into dedup groups ("keep one per cluster"). Written scale-shaped:
    * per-iteration cost is one join + one aggregate on the edge list (no
    * driver-side graph), converging in O(log diameter) iterations;
    * localCheckpoint truncates lineage between rounds. The oracle computes
    * the same components with a recursive CTE.
    */
  def duplicateClusters(s: SparkSession, d: String): DataFrame =
    duplicateClusters(s, d, smallGraphLimit = 1000000L)

  /** `smallGraphLimit` exposed so the distributed propagation path stays
    * testable at small scale (specs run both paths and compare).
    */
  /** The verified near-dup pair graph, materialized ONCE per (session,
    * corpus dir) and shared by its five consumers (clusters, PageRank,
    * triangles, the cleaning pipeline, the leakage-safe split) — the
    * production shape: you build the pair graph once and run every graph
    * analytic against the materialization, not the MinHash→LSH→Jaccard
    * chain five times. `localCheckpoint` truncates lineage so each
    * consumer plans against the checkpointed RDD. The chain itself is
    * still measured un-cached by the `dedup_*` queries that ARE the
    * chain.
    */
  private val verifiedPairsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (DataFrame, DataFrame)]()
  // Sessions that already have an eviction listener: ONE listener per
  // session covers every dataset key (it sweeps the whole sid prefix), so
  // registering per (session, dataset) would only pile redundant
  // listeners onto the SparkContext.
  private val evictionListenerRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  /** Keyed by GraftSession.sessionId (never recycled, unlike
    * identityHashCode) so a later session can never be handed a
    * checkpointed frame whose SparkContext has died; the listener evicts
    * this session's entries (pair graphs AND doc counts) when the context
    * stops, so the maps don't accumulate dead state across sessions in one
    * JVM.
    */
  private def ensureEvictionListener(s: SparkSession): Long = {
    val sid = graft.core.GraftSession.sessionId(s)
    if (evictionListenerRegistered.add(sid.toString)) {
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          verifiedPairsCache.keySet.removeIf(_.startsWith(sid + ":"))
          docCountCache.keySet.removeIf(_.startsWith(sid + ":"))
          deltaCutoffCache.keySet.removeIf(_.startsWith(sid + ":"))
          preGateCache.keySet.removeIf(_.startsWith(sid + ":"))
          evictionListenerRegistered.remove(sid.toString)
        }
      })
    }
    sid
  }

  /** The (candidates, verified) pair of the shared graph build — BOTH
    * stages checkpointed from ONE signature→banding execution (round-18
    * optimization: `dedup_report`'s stage-4 count previously re-ran the
    * whole chain that the cached verified graph had already executed; the
    * candidate frame is pair-count-sized, so keeping it costs nothing).
    */
  private def pairGraphCached(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val sid = ensureEvictionListener(s)
    verifiedPairsCache.computeIfAbsent(sid + ":" + d, _ => {
      val docs = Tables.documents(s, d)
      val cands = bandedPairsAdaptive(signaturesOf(docs),
        bandsOf, Seq("band", "h1", "h2"), Some(s"bpa:$d:k$numHashes")).localCheckpoint()
      val verified = jaccardVerifyCandidates(docs, cands)
        .select("doc_a", "doc_b").localCheckpoint()
      (cands, verified)
    })
  }

  private def verifiedPairsCached(s: SparkSession, d: String): DataFrame =
    pairGraphCached(s, d)._2

  /** Bench entry: materialize the shared verified-pair graph as its own
    * build dimension, so the graph analytics' per-query timings stay
    * attribution-stable instead of whichever consumer runs first silently
    * absorbing the one-time build.
    */
  def prebuildPairGraph(s: SparkSession, d: String): Unit = {
    verifiedPairsCached(s, d); ()
  }

  private[operators] def duplicateClusters(s: SparkSession, d: String,
                                           smallGraphLimit: Long): DataFrame =
    // Materialized pair graph (see verifiedPairsCached): both union
    // branches inside connectedComponentsOf reference `pairs`, and without
    // the checkpoint the whole MinHash→LSH→Jaccard chain executes twice
    // inside one job (measured ~2× the chain cost at sf0.1).
    connectedComponentsOf(verifiedPairsCached(s, d), smallGraphLimit)

  /** Connected components over an arbitrary (Long, Long) edge list.
    * Exposed separately from [[duplicateClusters]] so the distributed
    * path is testable on crafted graphs (long chains, forests) without a
    * corpus behind them.
    */
  private[operators] def connectedComponentsOf(pairsIn: DataFrame,
                                               smallGraphLimit: Long): DataFrame =
    connectedComponentsWithRounds(pairsIn, smallGraphLimit)._1

  /** Labels plus the number of hook+compress rounds the distributed path
    * actually ran (0 on the union-find fast path) — exposed so the
    * O(log diameter) convergence claim is a property the fast gate sweeps
    * (ClusterPathsSpec), not a comment a refactor can silently break.
    */
  private[operators] def connectedComponentsWithRounds(pairsIn: DataFrame,
                                                       smallGraphLimit: Long): (DataFrame, Int) = {
    val s = pairsIn.sparkSession
    val pairs = pairsIn.toDF("doc_a", "doc_b")
    // undirected edge list, both directions; size the iteration's
    // parallelism to the edge count — the candidate graph is orders of
    // magnitude smaller than the corpus, and iterating at corpus
    // parallelism makes every round pay full shuffle latency for a
    // near-empty dataset (measured 13 s → <2 s at sf0.1).
    val undirected = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint()
    val nEdges = undirected.count()

    // Small-graph fast path: after LSH banding + Jaccard verification the
    // candidate graph is orders of magnitude smaller than the corpus (477
    // nodes at sf0.1). Below 1M edges (~16 MB of longs) a driver union-find
    // finishes in milliseconds where each distributed round costs two jobs
    // of fixed latency; the bound keeps the driver safe, and the
    // distributed propagation below remains the >1M-edge scale path with
    // identical min-label semantics.
    if (nEdges <= smallGraphLimit) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val next = parent(c); parent(c) = r; c = next }
        r
      }
      undirected.collect().foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val out = parent.keys.toSeq.map(id => (id, find(id))).sorted
      import s.implicits._
      return (out.toDF("id", "cluster_id"), 0)
    }

    val parts = math.max(1L, math.min(200L, nEdges / 100000L + 1L)).toInt
    // repartition of already-checkpointed blocks: cheap lineage, no second
    // materialization needed
    val edges = undirected.repartition(parts)
    var labels = edges.select(col("doc_a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var changed = 1L
    var rounds = 0
    // Each round hooks (label ← min(own, neighbors' labels)) then
    // pointer-jumps (label ← label's label). Hooking alone needs
    // O(diameter) rounds — a >20-long chain of near-dups (template docs
    // with drifting edits) would previously exhaust the cap and SILENTLY
    // return a split component, which then poisons leakage-safe splits.
    // With compression the min label's reach doubles per round, so
    // convergence is O(log diameter): 64 rounds covers any graph whose
    // node ids fit in a Long. If the loop still exhausts, that is a bug,
    // not a big graph — throw rather than return wrong clusters.
    val maxRounds = 64
    while (changed > 0 && rounds < maxRounds) {
      // hook: candidate label per node = min of own and all neighbors'
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "doc_b").withColumnRenamed("label", "nl"), "doc_b")
        .groupBy(col("doc_a").as("id"))
        .agg(min(col("nl")).as("nmin"))
      val hooked = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint() // eager: the compress self-join reads it twice
      // compress: label ← label(label). Labels are always live node ids
      // (they start as ids and only ever move to a smaller id in the same
      // component), so the lookup side covers every label value; the left
      // join + coalesce is belt-and-braces, not a semantic branch.
      val jump = hooked.select(col("id").as("lid"), col("label").as("llabel"))
      val compressed = hooked
        .join(jump, col("label") === col("lid"), "left")
        .select(col("id"), col("old"),
          coalesce(col("llabel"), col("label")).as("label"))
        .localCheckpoint()
      changed = compressed.where(col("label") < col("old")).count()
      labels = compressed.select("id", "label")
      rounds += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components failed to converge after $maxRounds hook+jump rounds " +
          s"($changed labels still moving) — this indicates a bug, not graph size")
    (labels.withColumnRenamed("label", "cluster_id"), rounds)
  }

  /** PageRank (3 fixed iterations, damping 0.85) over the verified
    * near-dup graph — the canonical iterative weighted-graph algorithm,
    * shaped like the clusters pass: per iteration one join + one aggregate
    * on the edge list, nothing driver-side. Float determinism comes from
    * ORDERED neighbor folds: each node's contributions are sorted by
    * source id and left-folded (Spark `aggregate(array_sort(...))`, DuckDB
    * `list_reduce(list(... ORDER BY src))`) — a plain SUM would
    * accumulate in partition order and never hash-match across engines.
    */
  def pagerankNearDups(s: SparkSession, d: String): DataFrame = {
    // shared materialized pair graph: see verifiedPairsCached
    val pairs = verifiedPairsCached(s, d)
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint()
    val deg = edges.groupBy("doc_a").agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("doc_a").as("id")).distinct()
    val nNodes = nodes.count()
    var ranks = nodes.withColumn("r", lit(1.0) / nNodes.toDouble)
    for (_ <- 1 to 3) {
      val contribs = edges
        .join(ranks.withColumnRenamed("id", "doc_a"), "doc_a")
        .join(deg, "doc_a")
        .select(col("doc_b").as("id"), col("doc_a").as("src"),
          (col("r") / col("deg").cast("double")).as("c"))
      val folded = contribs.groupBy("id")
        .agg(expr("aggregate(transform(array_sort(collect_list(struct(src, c))), x -> x.c), " +
          "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("s"))
      ranks = nodes.join(folded, Seq("id"), "left")
        .select(col("id"),
          (lit(0.15) / nNodes.toDouble + lit(0.85) * coalesce(col("s"), lit(0.0))).as("r"))
    }
    ranks.select(col("id").as("doc_id"), col("r").as("rank"))
  }

  val pagerankNearDupsSql: String = {
    def iter(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT n.id, 0.15 / (SELECT nn FROM ncount) + 0.85 * coalesce(f.s, 0.0) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.doc_b AS id,
         |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        list(p.r / CAST(dg.deg AS DOUBLE) ORDER BY e.doc_a)), (acc, v) -> acc + v) AS s
         |    FROM edges e
         |    JOIN $prev p ON p.id = e.doc_a
         |    JOIN degrees dg ON dg.doc_a = e.doc_a
         |    GROUP BY e.doc_b) f ON f.id = n.id)""".stripMargin
    s"""WITH pairs AS (
       |  SELECT doc_a, doc_b FROM (${jaccardVerifiedPairsSql.replace("\n", "\n  ")})
       |),
       |edges AS (
       |  SELECT doc_a, doc_b FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |degrees AS (SELECT doc_a, COUNT(*) AS deg FROM edges GROUP BY 1),
       |nodes AS (SELECT DISTINCT doc_a AS id FROM edges),
       |ncount AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM nodes),
       |r0 AS (SELECT id, 1.0 / (SELECT nn FROM ncount) AS r FROM nodes),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT id AS doc_id, r AS rank FROM r3""".stripMargin
  }

  /** Exact-threshold Jaccard τ = 1/2 for the prefix-filtered self-join —
    * the SAME measure and threshold as [[jaccardVerifiedPairs]], kept
    * rational so every pruning bound and the final threshold stay in
    * INTEGER arithmetic (`2·inter ≥ uni`, `ceil(n/2)` as `(n+1) div 2`):
    * a float `0.5` would make the prefix length drift an element on some
    * set sizes and silently miss pairs.
    */
  val exactTauNum = 1
  val exactTauDen = 2

  /** EXACT set-similarity self-join (hashed-shingle-set Jaccard ≥ τ) via
    * prefix filtering — the PPJoin-family algorithm, and the exact
    * counterpart to the MinHash/LSH path over the SAME similarity measure
    * (52-bit hashed word-3-gram shingle sets, [[jaccardVerifiedPairs]]'s
    * τ = 1/2): LSH trades recall for speed; this loses NOTHING, so the
    * LSH pipeline's verified pairs are by construction a SUBSET of this
    * result — the recall of the approximate path is measurable against it
    * (ExactJoinSpec does exactly that).
    *
    * Prefix filter: under a global shingle order (rarest first), two sets
    * with J ≥ τ share an element within their first `n − ceil(τ·n) + 1`
    * — so candidates come from a bucket join on PREFIX shingles only,
    * and rarest-first ordering keeps bucket occupancy minimal.
    *
    * Scale shape: shingle-frequency table (one agg) → per-doc sort by
    * (freq, hash) → prefix explode (≈half the shingle stream) → one
    * bucket shuffle + the occupancy-capped hybrid pair expansion (the
    * [[pairsFromBucketedRows]] idiom: in-row below [[bucketExpandCap]],
    * per-pair-row join for dup-heavy hot buckets) → verification sized to
    * candidates. Quadratic work is confined to prefix-bucket occupancy,
    * never |docs|², and no single task ever materializes a hot bucket's
    * full pair set.
    *
    * The ORACLE is the brute-force O(n²) all-pairs join — tractable only
    * at gate scale, which is exactly the point: the hash match proves the
    * prefix filter is LOSSLESS (drops no qualifying pair and admits no
    * extra), not approximately right.
    */
  def exactJaccardJoin(s: SparkSession, d: String): DataFrame =
    exactJaccardJoinOf(
      Tables.documents(s, d)
        .select(col("doc_id"), graft.functions.TextFunctions.shingleHashes(col("text")).as("sh"))
        .where(size(col("sh")) > 0),
      Some(s"xjj:$d"))

  /** Declared `dedup_exact_jaccard_join_collapsed`: the exact-set
    * collapse FORCED on the gate corpus (which sits below the adaptive
    * threshold and would otherwise take the flat join), so the collapse
    * path — grouping, rep join, intra and cross expansion — is
    * oracle-gated cross-engine, not only spec-pinned. Same all-pairs
    * oracle: the collapse emits identical rows by construction.
    */
  def exactJaccardJoinCollapsedFace(s: SparkSession, d: String): DataFrame =
    exactJaccardJoinCollapsed(
      Tables.documents(s, d)
        .select(col("doc_id"), graft.functions.TextFunctions.shingleHashes(col("text")).as("sh"))
        .where(size(col("sh")) > 0)
        .localCheckpoint())

  lazy val exactJaccardJoinCollapsedSql: String = exactJaccardJoinSql

  /** [[exactJaccardJoin]] over an arbitrary `(doc_id, sh: ARRAY<BIGINT>)`
    * set frame (elements SORTED ASC and distinct per row — shingleHashes'
    * canonical form; the fused merge-count verification relies on it) —
    * split out so the property spec can sweep random corpora against an
    * in-test brute force.
    */
  // ----- EXACT-SET COLLAPSE (adaptive) ---------------------------------
  /** Adaptive exact-set collapse ([[exactJaccardJoinCollapsed]], the
    * production mitigation for dup-heavy corpora — exact dedup ahead of
    * near-dup): group documents by IDENTICAL hashed shingle set, run the
    * full prefix-filtered join on one REPRESENTATIVE per distinct set,
    * then reconstruct the doc-level answer:
    *
    *  - intra-group pairs (identical sets ⇒ J = 1 ≥ τ always) expand
    *    directly through the blocked kernel keyed on the group id — each
    *    pair lives in exactly ONE group, so the stream is unique by
    *    construction and skips the dedup exchange entirely (pure
    *    streaming: a 10⁴-copy clique's C(10⁴,2) pairs never touch an
    *    aggregation);
    *  - cross-group rep pairs carry set-level (inter, uni, jaccard) that
    *    every member pair shares verbatim; two streaming membership joins
    *    expand them (never an |A|·|B| array in one row).
    *
    * Group state is row-shaped throughout: metadata is one `(f1, f2,
    * gid = min doc_id, gsize)` row per DISTINCT set — the group key is a
    * 128-bit xxhash FINGERPRINT of the canonical sorted sh array (round-11
    * wrong #1: grouping on the raw array shuffled the corpus's full
    * shingle mass as the key; now the group/membership exchanges carry
    * 16 bytes and sh lives only on the representative rows the rep join
    * reads; collision probability ~10⁻¹⁹ at 10¹⁰ documents) — and
    * membership is one `(gid, doc_id)` row per document: no row ever
    * holds a whole group, so a 10⁸-copy boilerplate page costs 10⁸ skinny
    * rows, not one 10⁸-element array in a single task (the hazard class
    * the blocked kernels exist to avoid).
    *
    * Prefix/candidate/reduction work scales with DISTINCT sets, not
    * documents — on a boilerplate-heavy crawl that is orders of
    * magnitude — while the emitted rows are exactly the uncollapsed
    * join's (ExactJoinSpec pins the collapse against brute force, and the
    * oracle's all-pairs SQL is unchanged).
    *
    * [[lowDupPreGate]] (one cheap HLL aggregate — round-11 wrong #2)
    * skips the group-stats exchange entirely on low-duplication corpora;
    * past the gate, [[shouldCollapse]] decides the branch from the
    * fingerprint-keyed group stats, on the statistic that actually
    * predicts the win — duplication SHAPE, not duplicate mass:
    *
    *  - `maxGroup > bucketExpandCap`: one clique no longer fits a single
    *    blocked slice, so the flat kernel would spend ⌈g/cap⌉² slices on
    *    one page (the dup_heavy probe's 10⁴-copy clique: flat candidate
    *    stage 772 s, collapsed join 26.5 s — PLANS.md round-11);
    *  - `intraPairs > collapsePairBudgetPerDoc·n`: exact-dup pair mass
    *    the flat join would individually verify, per document of linear
    *    work. The sf1 replica corpus (90% dup MASS but only 4.5 intra
    *    pairs/doc in 10-member groups) measured flat 5.8 s vs collapsed
    *    10.5 s — dup mass alone is the wrong signal; the budget keeps
    *    shallow replication on the flat path and fires only when
    *    verification work on exact-dup cliques dwarfs corpus-linear cost.
    *
    * Either branch emits IDENTICAL rows (ExactJoinSpec pins both against
    * brute force; `dedup_exact_jaccard_join_collapsed` pins the
    * forced-collapse path against the unchanged all-pairs oracle), so the
    * branch is a pure plan choice, like AQE's.
    */
  val collapsePairBudgetPerDoc = 32L

  private[operators] def shouldCollapse(n: Long, maxGroup: Long, intraPairs: Long): Boolean =
    maxGroup > bucketExpandCap || intraPairs > collapsePairBudgetPerDoc * n

  private[operators] def exactJaccardJoinOf(docs: DataFrame,
                                            gateKey: Option[String] = None): DataFrame = {
    val d = docs.localCheckpoint()
    // ONE cheap aggregate decides whether the exact group-stats exchange
    // is worth running at all (round-11 wrong #2): on a low-duplication
    // corpus the flat join starts immediately — no groupBy on any key
    if (lowDupPreGateMemo(gateKey, d, xxhash64(col("sh")))) exactJaccardJoinFlat(d)
    else {
      // FINGERPRINT group key (round-11 wrong #1): grouping and membership
      // exchange 16-byte (f1, f2) keys — see [[fpKeyed]] for the two-family
      // construction — so the corpus's full shingle mass never travels as a
      // shuffle key; sh stays only on the representative rows the rep join
      // reads
      val keyed = fpKeyed(d, col("sh"))
      val groups = groupFrame(keyed, Seq("f1", "f2"))
      val (n, maxg, intra) = groupShapeStats(groups)
      if (!shouldCollapse(n, maxg, intra)) exactJaccardJoinFlat(d)
      else exactJaccardJoinCollapsedWith(d, keyed, groups.localCheckpoint())
    }
  }

  private[graft] def exactJaccardJoinCollapsed(docs: DataFrame): DataFrame = {
    val d = docs.localCheckpoint()
    val keyed = fpKeyed(d, col("sh"))
    exactJaccardJoinCollapsedWith(d, keyed,
      groupFrame(keyed, Seq("f1", "f2")).localCheckpoint())
  }

  /** The collapse body over a prebuilt fingerprint-keyed `(f1, f2, gid,
    * gsize)` group frame — [[exactJaccardJoinOf]] reuses the frame its
    * stats pass already materialized. Representatives recover their sh by
    * a doc_id semi-join (gid IS a doc_id), so the only exchanges carrying
    * shingle arrays are rep-sized.
    */
  private def exactJaccardJoinCollapsedWith(docs: DataFrame, keyed: DataFrame,
                                            groups: DataFrame): DataFrame = {
    val membership = keyed.join(groups, Seq("f1", "f2"))
      .select(col("gid"), col("doc_id"), col("gsize"))
      .localCheckpoint()
    val repPairs = exactJaccardJoinFlat(
      docs.join(groups.select(col("gid").as("doc_id")), Seq("doc_id"), "left_semi"))
    val intraPairs = pairsFromBucketedRowsRaw(
      membership.where(col("gsize") > 1).select(col("gid"), col("doc_id")),
      Seq("gid"), bucketExpandCap)
      .join(docs.select(col("doc_id").as("doc_a"), size(col("sh")).cast("long").as("n")),
        Seq("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("n").as("inter"), col("n").as("uni"),
        lit(1.0).as("jaccard"))
    val crossPairs = repPairs
      .join(membership.select(col("gid").as("doc_a"), col("doc_id").as("da")), Seq("doc_a"))
      .join(membership.select(col("gid").as("doc_b"), col("doc_id").as("db")), Seq("doc_b"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"),
        col("inter"), col("uni"), col("jaccard"))
    intraPairs.unionAll(crossPairs)
  }

  /** The flat (doc-level) prefix-filtered join — the body the adaptive
    * entry runs directly below the collapse threshold, and the collapse
    * runs over set representatives above it.
    */
  private def exactJaccardJoinFlat(docs: DataFrame): DataFrame = {
    val cands = exactJaccardCandidatesOf(docs, ppFilters = true)
    // verification via the fused merge-count kernel: `sh` is shingleHashes'
    // canonical sorted-distinct form, so sorted_intersect_count ≡
    // size(array_intersect) with no per-pair hash-set allocation — the
    // candidate stream is the hot path of the whole join
    cands
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sa")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sb")), Seq("doc_b"))
      .withColumn("inter", graft.functions.TextFunctions
        .sortedIntersectCount(col("sa"), col("sb")).cast("long"))
      .withColumn("uni", (size(col("sa")) + size(col("sb"))).cast("long") - col("inter"))
      .where(col("inter") * exactTauDen >= col("uni") * exactTauNum)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"),
        (col("inter").cast("double") / col("uni").cast("double")).as("jaccard"))
  }

  /** Candidate pairs for [[exactJaccardJoinOf]]: rarest-first prefix
    * explode → bucket pair expansion → (optionally) BOTH PPJoin pruning
    * filters, each one integer comparison, each lossless:
    *
    *  - LENGTH: J ≤ min(n_a,n_b)/max(n_a,n_b), so `max·τnum > min·τden`
    *    cannot reach τ — bounds verification on size-skewed corpora where
    *    a short doc's rare prefix shingle lands in a long doc's bucket.
    *  - POSITIONAL: a shared prefix element g at (sorted) positions
    *    (p_a, p_b) bounds the overlap — shared elements ordered before g
    *    number ≤ min(p_a−1, p_b−1) (each doc's list is sorted by the one
    *    global rarest-first order), g itself is 1, and shared elements
    *    after g number ≤ min(n_a−p_a, n_b−p_b). The bound holds for EVERY
    *    shared prefix element, so pairs are pruned on min-over-buckets vs
    *    the τ-threshold I ≥ τnum·(n_a+n_b)/(τnum+τden) (from
    *    I/(n_a+n_b−I) ≥ τ), kept in cross-multiplied integers.
    *
    * The per-pair aggregation replaces the plain `.distinct()` — same
    * shuffle, one extra min. Exposed with the filters switchable so
    * ScaleProbe can report the measured candidate-count drop.
    */
  private[operators] def exactJaccardCandidatesOf(docs: DataFrame,
                                                  ppFilters: Boolean): DataFrame =
    exactJaccardCandidatesOf(docs, ppFilters, bucketExpandCap)

  private[operators] def exactJaccardCandidatesOf(docs: DataFrame,
                                                  ppFilters: Boolean,
                                                  cap: Int): DataFrame = {
    val freq = docs.select(explode(col("sh")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
    val sorted = docs.select(col("doc_id"), explode(col("sh")).as("g"))
      .join(freq, Seq("g"))
      .groupBy("doc_id")
      .agg(expr("transform(array_sort(collect_list(struct(cnt, g))), x -> x.g)").as("sg"))
    val prefixes = sorted
      .withColumn("n", size(col("sg")))
      .withColumn("plen", expr(
        s"n - CAST((n * $exactTauNum + ${exactTauDen - 1}) DIV $exactTauDen AS INT) + 1"))
      .select(col("doc_id"), col("n"),
        posexplode(expr("slice(sg, 1, plen)")).as(Seq("p0", "g")))
      .withColumn("pos", col("p0") + 1)
    // struct sort is lexicographic on the leading field, so collecting
    // (doc_id, n, pos) structs preserves the canonical doc_a < doc_b
    // expansion order while carrying each side's size and the element's
    // sorted position into the pair. Same occupancy-capped hybrid as
    // [[pairsFromBucketedRows]]: in-row expansion below `cap`, per-pair-row
    // join above it (a dup-heavy corpus puts every copy's prefix in the
    // same shingle buckets — the hot-bucket shape that must never build
    // B²/2 structs in one row), with the checkpoint materializing the slim
    // bucket rows once so neither branch re-runs the prefix chain.
    val buckets = prefixes
      .groupBy("g")
      .agg(sort_array(collect_set(struct(col("doc_id"), col("n"), col("pos")))).as("ids"))
      .where(size(col("ids")) > 1)
      .localCheckpoint()
    val coldPairs = buckets.where(size(col("ids")) <= cap)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(x.doc_id AS doc_a, y.doc_id AS doc_b, x.n AS na, y.n AS nb,
          |           least(x.pos, y.pos) + least(x.n - x.pos, y.n - y.pos) AS ub))))""".stripMargin
      )).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.na"), col("p.nb"), col("p.ub"))
    // Same BLOCKED triangular self-join as [[pairsFromBucketedRows]]'s hot
    // branch (see the rationale there): ns = ⌈B/cap⌉ hash slices bound
    // every slice-pair task at ~cap² output rows, so a dup-heavy prefix
    // bucket streams through uniformly small tasks instead of funneling
    // B²/2 payload-carrying pairs into one task's partial-agg map (the
    // measured OOM shape at 10⁴ copies). The ub bound is symmetric; the
    // size payload swaps with the orientation.
    val hotRows = buckets.where(size(col("ids")) > cap)
      .withColumn("nslice", ceil(size(col("ids")).cast("double") / cap).cast("int"))
      .select(col("g"), col("nslice"), explode(col("ids")).as("x"))
      .select(col("g"), col("nslice"), col("x.doc_id").as("doc_id"),
        col("x.n").as("n"), col("x.pos").as("pos"))
      .withColumn("sl", pmod(xxhash64(col("doc_id")), col("nslice").cast("long")).cast("int"))
    val hotLeft = hotRows
      .withColumn("sb", explode(sequence(col("sl"), col("nslice") - 1)))
      .select(col("g"), col("sl").as("sa"), col("sb"),
        col("doc_id").as("da"), col("n").as("nra"), col("pos").as("pa"))
    val hotRight = hotRows
      .select(col("g"), col("sl").as("sb"),
        col("doc_id").as("db"), col("n").as("nrb"), col("pos").as("pb"))
    val hotPairs = hotLeft
      .join(hotRight, Seq("g", "sb"))
      .where(col("sa") < col("sb") || col("da") < col("db"))
      .select(
        least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"),
        when(col("da") < col("db"), col("nra")).otherwise(col("nrb")).as("na"),
        when(col("da") < col("db"), col("nrb")).otherwise(col("nra")).as("nb"),
        (least(col("pa"), col("pb")) +
          least(col("nra") - col("pa"), col("nrb") - col("pb"))).as("ub"))
    val pairs = coldPairs.unionAll(hotPairs)
    if (!ppFilters)
      pairDistinct(pairs.select(col("doc_a"), col("doc_b")))
    else {
      // min(pa−1,pb−1) + 1 = least(pa,pb) when both ≥ 1 — folded above.
      // Pair reduction as a SORTED window rather than groupBy().agg(min):
      // ordering each pair's rows by ub and keeping row 1 IS min-over-
      // buckets, and the sort-based exchange spills where the hash-agg's
      // per-task partial maps (one entry per distinct pair seen — ~10⁷ on
      // a dup-heavy corpus, combining nothing) died on the heap. The
      // LENGTH filter is pair-static, so it prunes the row stream BEFORE
      // the exchange.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_a", "doc_b").orderBy("ub")
      pairs
        .where(greatest(col("na"), col("nb")) * exactTauNum <=
          least(col("na"), col("nb")) * exactTauDen)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .where(col("ub") * (exactTauNum + exactTauDen) >=
          (col("na") + col("nb")) * exactTauNum)
        .select("doc_a", "doc_b")
    }
  }

  /** ScaleProbe entry for the containment join: (candidates, qualifying
    * pairs) over an arbitrary `(doc_id, sh)` set frame — the measured
    * evidence that the asymmetric prefix filter's candidate set grows
    * near-linearly with corpus size.
    */
  def containmentJoinProbe(docs: DataFrame): (Long, Long) = (
    containmentCandidatesOf(docs).count(),
    containmentJoinOf(docs).count())

  /** ScaleProbe entry: (unfiltered candidates, length-filtered candidates,
    * qualifying pairs) over an arbitrary `(doc_id, sh)` set frame — the
    * measured evidence that prefix-bucket occupancy (and the length
    * filter's bite) grows near-linearly with corpus size.
    */
  def exactJoinProbe(docs: DataFrame): (Long, Long, Long) = (
    exactJaccardCandidatesOf(docs, ppFilters = false).count(),
    exactJaccardCandidatesOf(docs, ppFilters = true).count(),
    exactJaccardJoinOf(docs).count())

  /** Dup-heavy hot-bucket probe entries (ScaleProbe `dup_heavy` section):
    * the band-row stream over an arbitrary (doc_id, text) frame, and pair
    * counts through the MinHash band / PPJoin prefix paths at an EXPLICIT
    * occupancy cap — `Int.MaxValue` replays the unconditional in-row form
    * so its degradation under copy-heavy skew is measurable against the
    * hybrid default.
    */
  def bandRowsOf(docs: DataFrame): DataFrame = bandsOf(signaturesOf(docs))
  def bandPairsCount(bands: DataFrame, cap: Int): Long =
    pairsFromBands(bands, cap).count()
  def ppjoinCandidatesCount(docs: DataFrame, cap: Int): Long =
    exactJaccardCandidatesOf(docs, ppFilters = true, cap = cap).count()
  def simhashPairsCount(docs: DataFrame, bits: Int, cap: Int): Long = {
    val sigCol =
      if (bits == 16) graft.functions.TextFunctions.simhash16(col("text"))
      else graft.functions.TextFunctions.simhash64(col("text"))
    val sig = docs.select(col("doc_id"), sigCol.as("simhash"))
    pairsFromBucketedRows(simhashPieces(sig, bits), Seq("pc", "pv"), cap).count()
  }
  def deltaFromBandsCount(bands: DataFrame, cutoff: Long): Long =
    deltaCandidatesFromBands(bands, cutoff).count()
  def containmentCandidatesCount(docs: DataFrame): Long =
    containmentCandidatesOf(docs).count()
  def exactJaccardJoinCount(docs: DataFrame): Long =
    exactJaccardJoinOf(docs).count()
  // round-12 adaptive-path probe entries: the production faces the
  // collapse now routes, measured at the clique next to the raw kernels
  def lshAdaptiveCount(docs: DataFrame): Long =
    bandedPairsAdaptive(signaturesOf(docs), bandsOf, Seq("band", "h1", "h2")).count()
  def simhashAdaptiveCount(docs: DataFrame): Long =
    simhashNearDupPairsWith(
      docs.select(col("doc_id"),
        graft.functions.TextFunctions.simhash64(col("text")).as("simhash")), 64).count()
  def containmentJoinCount(docs: DataFrame): Long =
    containmentJoinOf(docs).count()
  def deltaSimhashCandidatesCount(docs: DataFrame, cutoff: Long): Long =
    deltaSimhashCandidates(
      docs.select(col("doc_id"),
        graft.functions.TextFunctions.simhash64(col("text")).as("simhash"))
        .localCheckpoint(), cutoff).count()

  /** The candidate pair frame itself, for probes asserting structural
    * properties (ScaleCorpusSpec: no cross-replica pairs).
    */
  def exactJoinProbeCandidates(docs: DataFrame): DataFrame =
    exactJaccardCandidatesOf(docs, ppFilters = true)

  val exactJaccardJoinSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform($shingleSqlExpr,
       |      g -> ('0x' || substr(md5(g), 1, 13))::BIGINT)) AS hs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
       | t2 AS (SELECT doc_id, hs FROM t WHERE len(hs) > 0),
       | p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |   CAST(len(list_filter(a.hs, x -> list_contains(b.hs, x))) AS BIGINT) AS inter,
       |   CAST(len(a.hs) + len(b.hs)
       |     - len(list_filter(a.hs, x -> list_contains(b.hs, x))) AS BIGINT) AS uni
       |  FROM t2 a JOIN t2 b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, inter, uni,
       |  CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
       |FROM p WHERE inter * $exactTauDen >= uni * $exactTauNum""".stripMargin

  /** Triangle census of the verified near-dup graph — the graph-analytic
    * quality signal on top of pairwise dedup: a triangle-dense
    * neighborhood is a coherent duplicate FAMILY (template spam, mirrored
    * sites), a wedge that never closes is more likely an LSH coincidence.
    * Emits triangle count, wedge (open 2-path) count and the global
    * clustering coefficient 3·T/W.
    *
    * Scale shape — the textbook ordered-edge-join triangle count: edges
    * are canonical (doc_a < doc_b, guaranteed by the in-bucket pair
    * expansion), so e1(a,b) ⋈ e2(b,c) enumerates each candidate wedge with
    * a < b < c exactly once and a LEFT SEMI against e3(a,c) closes it —
    * every triangle counted once, no ±6 symmetry blowup, no corpus access
    * at all (work is sized to the VERIFIED-PAIR graph, orders of magnitude
    * smaller than the corpus; the joins shuffle on edge endpoints).
    * Wedges come from the degree table (deg·(deg−1)/2 — exact: the
    * product is even, values < 2^52). Integer stats are exact; the one
    * float op is the final coefficient division, mirrored verbatim.
    */
  def triangleStatsNearDups(s: SparkSession, d: String): DataFrame =
    triangleStatsOf( // shared materialized pair graph: see verifiedPairsCached
      verifiedPairsCached(s, d).select(col("doc_a").as("a"), col("doc_b").as("b")))

  /** [[triangleStatsNearDups]] over an arbitrary canonical (a < b) edge
    * frame — split out so the spec can pin the census on crafted graphs.
    */
  private[operators] def triangleStatsOf(e: DataFrame): DataFrame = {
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val wedges = deg.agg(
      sum(expr("CAST(deg * (deg - 1) / 2 AS BIGINT)")).as("n_wedges"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e2.b").as("z"))
      .join(e.as("e3"), col("x") === col("e3.a") && col("z") === col("e3.b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    tri.crossJoin(broadcast(wedges))
      .select(col("n_triangles"), col("n_wedges"),
        when(col("n_wedges") === 0L, lit(null).cast("double"))
          .otherwise((lit(3L) * col("n_triangles")).cast("double") / col("n_wedges").cast("double"))
          .as("clustering_coeff"))
  }

  val triangleStatsNearDupsSql: String =
    s"""WITH e AS (
       |  SELECT doc_a AS a, doc_b AS b FROM (${jaccardVerifiedPairsSql.replace("\n", "\n  ")})),
       | deg AS (SELECT v, COUNT(*) AS deg
       |         FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY v),
       | w AS (SELECT CAST(SUM(CAST(deg * (deg - 1) / 2 AS BIGINT)) AS BIGINT) AS n_wedges FROM deg),
       | t AS (SELECT COUNT(*) AS n_triangles
       |       FROM e e1 JOIN e e2 ON e1.b = e2.a
       |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
       |SELECT t.n_triangles, w.n_wedges,
       |  CASE WHEN w.n_wedges = 0 THEN NULL
       |       ELSE CAST(3 * t.n_triangles AS DOUBLE) / CAST(w.n_wedges AS DOUBLE) END AS clustering_coeff
       |FROM t, w""".stripMargin

  /** Per-SOURCE duplication report: for each ingest source, total docs,
    * docs sitting in a near-dup cluster, and the dup permille — the
    * corpus-health view a pipeline owner reads to decide which source to
    * re-crawl or down-weight (duplication concentrates by provenance, so
    * per-source attribution is the actionable cut of the funnel). One
    * left join of the corpus against the (small) cluster assignment and
    * one grouped aggregate; the rate stays in integer permille so no
    * float boundary differs across engines.
    */
  def dupRateBySource(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), col("source"))
      .join(duplicateClusters(s, d).withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(col("cluster_id")).as("n_clustered"),
        countDistinct(col("cluster_id")).as("n_clusters"))
      .select(col("source"), col("n_docs"), col("n_clustered"), col("n_clusters"),
        expr("CAST((n_clustered * 1000) DIV n_docs AS BIGINT)").as("dup_permille"))
      .orderBy("source")

  lazy val dupRateBySourceSql: String =
    s"""WITH c AS (${duplicateClustersSql.replace("\n", "\n  ")})
       |SELECT d.source, COUNT(*) AS n_docs,
       |  COUNT(c.cluster_id) AS n_clustered,
       |  COUNT(DISTINCT c.cluster_id) AS n_clusters,
       |  CAST((COUNT(c.cluster_id) * 1000) // COUNT(*) AS BIGINT) AS dup_permille
       |FROM documents d LEFT JOIN c ON c.id = d.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** Per-source CLUSTER-SIZE attribution — the boilerplate detector on top
    * of [[dupRateBySource]]'s rate: for each source, the distribution of
    * its per-cluster member counts (how many of this source's docs sit in
    * each near-dup cluster). A source whose max/p99 dwarf its median is
    * shipping one templated page thousands of times — re-crawl or
    * down-weight THAT, not the whole source. One grouped count over the
    * shared cluster assignment + one per-source aggregate; the p99 is an
    * EXACT order statistic at integer rank ⌈0.99·n⌉ = (99·(n+1)) div 100
    * (both engines index the same sorted list — no interpolation, no float
    * boundary).
    */
  def clusterStatsBySource(s: SparkSession, d: String): DataFrame = {
    val m = Tables.documents(s, d).select(col("doc_id"), col("source"))
      .join(duplicateClusters(s, d).withColumnRenamed("id", "doc_id"), Seq("doc_id"))
      .groupBy("source", "cluster_id")
      .agg(count(lit(1)).as("m"))
    m.groupBy("source")
      .agg(count(lit(1)).as("n_clusters"),
        max(col("m")).as("max_cluster_docs"),
        expr("element_at(array_sort(collect_list(m)), " +
          "CAST((count(*) * 99 + 99) DIV 100 AS INT))").as("p99_cluster_docs"))
      .orderBy("source")
  }

  lazy val clusterStatsBySourceSql: String =
    s"""WITH c AS (${duplicateClustersSql.replace("\n", "\n  ")}),
       | m AS (SELECT d.source, c.cluster_id, COUNT(*) AS m
       |       FROM documents d JOIN c ON c.id = d.doc_id
       |       GROUP BY d.source, c.cluster_id)
       |SELECT source, COUNT(*) AS n_clusters, MAX(m) AS max_cluster_docs,
       |  list_sort(list(m))[CAST((COUNT(*) * 99 + 99) // 100 AS INT)] AS p99_cluster_docs
       |FROM m GROUP BY source ORDER BY source""".stripMargin

  val duplicateClustersSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_a, doc_b FROM (${jaccardVerifiedPairsSql.replace("\n", "\n  ")})
       |),
       |edges AS (
       |  SELECT doc_a, doc_b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach(id, label) AS (
       |  SELECT doc_a, doc_a FROM edges
       |  UNION
       |  SELECT e.doc_a, r.label FROM edges e JOIN reach r ON e.doc_b = r.id)
       |SELECT id, MIN(label) AS cluster_id FROM reach GROUP BY id""".stripMargin

  /** Dedup pipeline report: one (stage, n) row per funnel stage — corpus
    * size → exact groups → normalized groups → LSH candidates → verified
    * pairs → clusters → clustered docs. The ops dashboard a pipeline owner
    * watches per corpus drop: a stage ratio drifting (candidates
    * exploding, verification admitting everything) flags a data problem
    * before the expensive downstream stages run. Each count is the
    * already-declared operator's own plan; the union is seven small
    * aggregates, nothing new to maintain.
    */
  def dedupReport(s: SparkSession, d: String): DataFrame = {
    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))
    // stages 4 AND 5 both counted off the shared pair-graph
    // materialization (round-18: stage 4 previously re-ran the whole
    // signature→banding chain the cached graph had already executed; the
    // checkpointed candidate frame carries identical rows by construction
    // — same bandedPairsAdaptive invocation lshCandidatePairs makes)
    val (cands, verified) = pairGraphCached(s, d)
    stage("1_docs", Tables.documents(s, d))
      .unionAll(stage("2_exact_groups", exactDedup(s, d)))
      .unionAll(stage("3_normalized_groups", normalizedDedup(s, d)))
      .unionAll(stage("4_lsh_candidates", cands))
      .unionAll(stage("5_verified_pairs", verified))
      .unionAll(stage("6_clusters",
        duplicateClusters(s, d).select("cluster_id").distinct()))
      .unionAll(stage("7_clustered_docs", duplicateClusters(s, d)))
  }

  /** The funnel over an ARBITRARY (doc_id, text) frame — no session cache,
    * pair graph built fresh and checkpointed locally. This is the form the
    * STREAMED face runs over the landed table; [[dedupReport]] keeps the
    * session-cached graph for the declared batch face.
    */
  private[graft] def dedupReportOver(docs: DataFrame,
                                     gateKey: Option[String] = None): DataFrame = {
    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))
    // ONE signature→banding execution feeds BOTH the stage-4 count and
    // verification (round-18: stage 4 previously re-ran the whole chain
    // inside the final union job while stage 5 read the checkpoint)
    val cands = bandedPairsAdaptive(signaturesOf(docs),
      bandsOf, Seq("band", "h1", "h2"), gateKey).localCheckpoint()
    val verified = jaccardVerifyCandidates(docs, cands)
      .select("doc_a", "doc_b").localCheckpoint()
    val clusters = connectedComponentsOf(verified, smallGraphLimit = 1000000L)
    stage("1_docs", docs)
      .unionAll(stage("2_exact_groups", exactDedupOf(docs)))
      .unionAll(stage("3_normalized_groups", normalizedDedupOf(docs)))
      .unionAll(stage("4_lsh_candidates", cands))
      .unionAll(stage("5_verified_pairs", verified))
      .unionAll(stage("6_clusters", clusters.select("cluster_id").distinct()))
      .unionAll(stage("7_clustered_docs", clusters))
  }

  /** Documents corpus landed through the STREAMING ingest path — the
    * composed pin of the reference's core promise (buffered writes are
    * indistinguishable from durable ones, src/cache/writable_cache.rs:
    * 248-298) at the ANALYTICS layer: the corpus is staged as multiple
    * parquet files, streamed in with `maxFilesPerTrigger = 1` (one
    * micro-batch per file) through [[graft.streaming.StreamIngest]] into a
    * [[graft.core.VectorTable]], and the landed table is verified
    * row-identical to the batch source at build time (throw on any
    * divergence). Built once per machine behind the pointer protocol.
    */
  private val streamedDocsRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def streamedDocumentsRoot(s: SparkSession, d: String): String =
    streamedDocsRoots.computeIfAbsent(d, _ => {
      import java.nio.file.{Files, Paths, StandardOpenOption}
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d#streamed".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft-rowid-tables")
      Files.createDirectories(base)
      val pointer = base.resolve(s"docs-streamed-$key.path")
      if (!Files.exists(pointer)) {
        val dir = base.resolve(s"docs-streamed-$key-${java.util.UUID.randomUUID()}")
        val source = Tables.documents(s, d)
        source.repartition(5).write.parquet(s"$dir/staging")
        val t = graft.core.VectorTable.create(s, s"$dir/table")
        val stream = s.readStream.schema(source.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/staging")
        val q = graft.streaming.StreamIngest.start(stream, t, s"$dir/ckpt",
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
        q.awaitTermination()
        val landed = t.scan().select(source.columns.map(col): _*)
        val missing = source.exceptAll(landed).count()
        val extra = landed.exceptAll(source).count()
        if (missing != 0 || extra != 0)
          throw new IllegalStateException(
            s"streamed ingest diverged from batch source: $missing missing, $extra extra rows")
        try Files.write(pointer, dir.toString.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          deleteRecursively(dir) } // racer won; adopt theirs, drop our build
      }
      Files.readString(pointer)
    })

  /** Declared `dedup_report_streamed`: the SAME funnel as [[dedupReport]]
    * over the stream-landed table — the oracle replays [[dedupReportSql]]
    * over the batch source, so a green row IS the proof that N micro-batch
    * appends and one batch load produce hash-identical analytics.
    */
  def dedupReportStreamed(s: SparkSession, d: String): DataFrame = {
    val root = streamedDocumentsRoot(s, d)
    val landed = graft.core.VectorTable.open(s, s"$root/table")
      .scan().select(col("doc_id"), col("text"))
    dedupReportOver(landed, Some(s"bpa:$root:k$numHashes"))
  }

  def prebuildStreamedDocs(s: SparkSession, d: String): Unit = {
    streamedDocumentsRoot(s, d); ()
  }

  val dedupReportSql: String =
    s"""SELECT '1_docs' AS stage, COUNT(*) AS n FROM documents
       |UNION ALL SELECT '2_exact_groups', COUNT(*) FROM (${exactDedupSql.replace("\n", "\n  ")})
       |UNION ALL SELECT '3_normalized_groups', COUNT(*) FROM (${normalizedDedupSql.replace("\n", "\n  ")})
       |UNION ALL SELECT '4_lsh_candidates', COUNT(*) FROM (${lshCandidatePairsSql.replace("\n", "\n  ")})
       |UNION ALL SELECT '5_verified_pairs', COUNT(*) FROM (${jaccardVerifiedPairsSql.replace("\n", "\n  ")})
       |UNION ALL SELECT '6_clusters', COUNT(DISTINCT cluster_id) FROM (${duplicateClustersSql.replace("\n", "\n  ")})
       |UNION ALL SELECT '7_clustered_docs', COUNT(*) FROM (${duplicateClustersSql.replace("\n", "\n  ")})""".stripMargin

  val simhashBits = 16

  /** SimHash: 16-bit signature from token-hash bit voting — computed by the
    * native one-pass kernel ([[graft.functions.SimHash16]]): a map-only
    * scan projection with NO shuffle, where the declarative explode→groupBy
    * form shuffled every (doc, token) row. At 100 TB that is the difference
    * between a free column and a corpus-sized exchange.
    */
  def simhashSignatures(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), graft.functions.TextFunctions.simhash16(col("text")).as("simhash"))

  /** The explode→groupBy formulation the kernel replaced — kept for the
    * bit-parity spec (kernel ≡ declarative on every doc).
    */
  private[graft] def simhashSignaturesDeclarative(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .withColumn("hv", expr(h("t", 99)))
    val sums = (0 until simhashBits).map(b =>
      sum(when(expr(s"(shiftright(hv, $b) & 1) = 1"), 1).otherwise(-1)).as(s"b$b"))
    val bits = tok.groupBy("doc_id").agg(sums.head, sums.tail: _*)
    val combined = (0 until simhashBits)
      .map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    bits.select(col("doc_id"), combined.as("simhash"))
  }

  /** SimHash near-dup PAIRS: documents whose SimHash signatures differ in
    * ≤ [[simhashHammingMax]] bits, generated by PIGEONHOLE bucketing — the
    * signature splits into pieces such that ≤2 bit errors leave at least
    * one piece intact, so every qualifying pair shares a (piece, value)
    * bucket (lossless for the threshold). Candidates come from the SAME
    * occupancy-capped hybrid kernel as the MinHash band join
    * ([[pairsFromBucketedRows]] on the (pc, pv) bucket key): near-uniform
    * piece values keep buckets tiny (in-row expansion), and a copy-clique
    * bucket takes the blocked triangular join with ~cap²-bounded tasks.
    * Hamming verification is one codegen'd `bit_count(a ^ b)`.
    *
    * Signature WIDTH scales with the corpus ([[simhashBitsFor]], the
    * `cellsFor` discipline): at or below [[simhashWideThreshold]] docs the
    * signature is 16 bits in 3 pieces (6+5+5 — at most 64/32/32 bucket
    * keys, fine when occupancy is small and required for the oracle, which
    * replays the 16-bit signature bit-for-bit); above it, a 64-bit
    * signature ([[graft.functions.SimHash64]]) in 4×16-bit pieces keys
    * 65 536 values per piece, keeping bucket occupancy bounded as the
    * corpus grows — with 16-bit signatures every corpus beyond ~10⁵ docs
    * saturates all 128 buckets and candidate generation degenerates to
    * all-pairs regardless of join form.
    */
  val simhashHammingMax = 2

  /** Corpus-size threshold above which the 64-bit signature is used. The
    * oracle gate corpora (500 docs at sf0.001/sf0.01) stay 16-bit — the
    * DuckDB oracle replays that signature bit-for-bit; every larger corpus
    * (sf0.1's 5 000 docs, the 10×-replica 50 000, production) goes wide:
    * at 5 000 docs the 128 16-bit bucket keys already hold ~120 docs each
    * and the pair join pays ~1.7M candidate rows for ~8k qualifying pairs,
    * while 4×65 536 keys keep occupancy ~1.
    */
  val simhashWideThreshold = 1000L

  def simhashBitsFor(n: Long): Int = if (n <= simhashWideThreshold) 16 else 64

  // Keyed by (session, dataset dir) and evicted with verifiedPairsCache's
  // application-end listener — the same lifecycle discipline as the other
  // per-dataset memos, so a regenerated dataset read by a NEW session can
  // never pick up a stale count (and with it a stale signature width).
  private[operators] val docCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def documentCount(s: SparkSession, d: String): Long = {
    val sid = ensureEvictionListener(s)
    docCountCache.computeIfAbsent(sid + ":" + d, _ => Tables.documents(s, d).count())
  }

  /** 64-bit twin of [[simhashSignatures]] — same map-only kernel shape. */
  private[graft] def simhashSignatures64(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), graft.functions.TextFunctions.simhash64(col("text")).as("simhash"))

  /** Pigeonhole pieces of a (doc_id, simhash) frame: 3 pieces (6+5+5 bits)
    * at width 16, 4 pieces (16 bits each) at width 64. Both are lossless
    * for hamming ≤ 2 (2 errors touch ≤ 2 pieces, leaving ≥ 1 intact).
    */
  private[graft] def simhashPieces(sig: DataFrame, bits: Int): DataFrame = {
    val pieces =
      if (bits == 16) array(
        struct(lit(0).as("pc"), expr("simhash & 63").as("pv")),
        struct(lit(1).as("pc"), expr("shiftright(simhash, 6) & 31").as("pv")),
        struct(lit(2).as("pc"), expr("shiftright(simhash, 11) & 31").as("pv")))
      else array((0 until 4).map(p =>
        struct(lit(p).as("pc"), expr(s"shiftright(simhash, ${16 * p}) & 65535").as("pv"))): _*)
    sig.select(col("doc_id"), explode(pieces).as("b"))
      .select(col("doc_id"), col("b.pc"), col("b.pv"))
  }

  /** Candidate pairs from the pigeonhole pieces via the SAME occupancy-
    * capped hybrid kernel as the MinHash band join: near-uniform piece
    * values keep buckets tiny (the in-row fast path), while a copy-clique
    * corpus — 10⁴+ identical docs sharing every (pc, pv) bucket — takes
    * the blocked triangular join, whose per-task output is bounded at
    * ~cap². The previous plain (pc, pv) self-join funneled a clique
    * bucket's B²/2 pairs through the few tasks owning that key — the same
    * partial-agg OOM shape the dup-heavy probe measured for the PPJoin
    * prefix stage.
    */
  private[graft] def simhashCandidatesWith(sig: DataFrame, bits: Int): DataFrame =
    pairsFromBucketedRows(simhashPieces(sig, bits), Seq("pc", "pv"), bucketExpandCap)

  /** ScaleProbe entry: (candidates, qualifying pairs) for the pigeonhole
    * join over an arbitrary (doc_id, text) frame at an explicit signature
    * width — the measured evidence that the 64-bit pieces keep candidate
    * growth linear where 16-bit buckets saturate.
    */
  def simhashJoinProbe(docs: DataFrame, bits: Int): (Long, Long) = {
    val sigCol =
      if (bits == 16) graft.functions.TextFunctions.simhash16(col("text"))
      else graft.functions.TextFunctions.simhash64(col("text"))
    val sig = docs.select(col("doc_id"), sigCol.as("simhash")).localCheckpoint()
    (simhashCandidatesWith(sig, bits).count(),
      simhashNearDupPairsWith(sig, bits).count())
  }

  /** Adaptive entry: identical documents have identical signatures, so a
    * boilerplate clique (every copy in the same (pc, pv) buckets, every
    * pair at hamming 0) takes the EXACT-SET COLLAPSE keyed on the
    * signature VALUE itself — one 8-byte long, the cheapest group key in
    * the family: the pigeonhole join runs on one representative per
    * distinct signature, intra-group pairs stream dedup-free with
    * hamming = 0, cross pairs lift the rep pair's hamming verbatim
    * (hamming(a, b) is a function of the two signatures alone, so
    * collapsed ≡ flat PAIR-FOR-PAIR — CollapseEquivalenceSpec pins it).
    * The branch rule is the shared [[lowDupPreGate]] → [[shouldCollapse]]
    * pair; the signature frame is localCheckpoint'd so the map-only
    * kernel executes once for the gate and all downstream consumers.
    */
  private[graft] def simhashNearDupPairsWith(sigIn: DataFrame, bits: Int,
                                             gateKey: Option[String] = None): DataFrame = {
    val sig = sigIn.localCheckpoint()
    if (lowDupPreGateMemo(gateKey, sig, col("simhash"))) simhashNearDupPairsFlat(sig, bits)
    else {
      val groups = groupFrame(sig.select(col("simhash"), col("doc_id")), Seq("simhash"))
      val (n, maxg, intra) = groupShapeStats(groups)
      if (!shouldCollapse(n, maxg, intra)) simhashNearDupPairsFlat(sig, bits)
      else simhashPairsCollapsedBody(sig, groups, bits)
    }
  }

  /** Forced collapse body (spec-pinnable below the adaptive threshold). */
  private[operators] def simhashPairsCollapsed(sigIn: DataFrame, bits: Int): DataFrame = {
    val sig = sigIn.localCheckpoint()
    simhashPairsCollapsedBody(sig,
      groupFrame(sig.select(col("simhash"), col("doc_id")), Seq("simhash")), bits)
  }

  private def simhashPairsCollapsedBody(sig: DataFrame, groups: DataFrame,
                                        bits: Int): DataFrame = {
    val g = groups.localCheckpoint()
    val membership = sig.join(g, Seq("simhash"))
      .select(col("gid"), col("doc_id"), col("gsize")).localCheckpoint()
    val repPairs = simhashNearDupPairsFlat(g.select(col("gid").as("doc_id"), col("simhash")), bits)
    val intraPairs = pairsFromBucketedRowsRaw(
      membership.where(col("gsize") > 1).select(col("gid"), col("doc_id")),
      Seq("gid"), bucketExpandCap)
      .select(col("doc_a"), col("doc_b"), lit(0).as("hamming"))
    val cross = repPairs
      .join(membership.select(col("gid").as("doc_a"), col("doc_id").as("da")), Seq("doc_a"))
      .join(membership.select(col("gid").as("doc_b"), col("doc_id").as("db")), Seq("doc_b"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
    intraPairs.unionAll(cross)
  }

  private[operators] def simhashNearDupPairsFlat(sig: DataFrame, bits: Int): DataFrame = {
    val cands = simhashCandidatesWith(sig, bits)
    cands
      .join(sig.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), Seq("doc_a"))
      .join(sig.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), Seq("doc_b"))
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .where(col("hamming") <= simhashHammingMax)
      .select("doc_a", "doc_b", "hamming")
  }

  def simhashNearDupPairs(s: SparkSession, d: String): DataFrame = {
    val bits = simhashBitsFor(documentCount(s, d))
    val sig = if (bits == 16) simhashSignatures(s, d) else simhashSignatures64(s, d)
    // gate input = the bits-wide corpus signature, shared with the wide
    // face when the corpus routes to 64-bit
    simhashNearDupPairsWith(sig, bits, Some(s"sh:$d:$bits"))
  }

  /** Declared WIDE face: forces the 64-bit signature regardless of corpus
    * size — the code path every production-scale corpus takes through
    * [[simhashNearDupPairs]], here pinned by its own DuckDB oracle
    * ([[simhashNearDupPairsWideSql]] replays the 64-bit signature exactly)
    * instead of only by SimHashSpec's in-test brute force.
    */
  def simhashNearDupPairsWide(s: SparkSession, d: String): DataFrame =
    simhashNearDupPairsWith(simhashSignatures64(s, d), 64, Some(s"sh:$d:64"))

  /** The retired `collect_set`→flatten in-bucket expansion, kept ONLY for
    * SimHashPairsSpec's pair-for-pair equivalence pin against the join
    * form. Scale hazard: one row holds an entire bucket and the quadratic
    * pair expansion runs in that row's single task.
    */
  private[graft] def simhashNearDupPairsGrouped(s: SparkSession, d: String): DataFrame = {
    val sig = simhashSignatures(s, d)
    val cands = simhashPieces(sig, 16)
      .groupBy("pc", "pv").agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y -> struct(x AS doc_a, y AS doc_b))))""".stripMargin
      )).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
    cands
      .join(sig.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), Seq("doc_a"))
      .join(sig.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), Seq("doc_b"))
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .where(col("hamming") <= simhashHammingMax)
      .select("doc_a", "doc_b", "hamming")
  }

  lazy val simhashNearDupPairsSql: String =
    s"""WITH s AS (${simhashSignaturesSql.replace("\n", "\n  ")}),
       | pieces AS (
       |  SELECT doc_id, 0 AS pc, simhash & 63 AS pv FROM s
       |  UNION ALL SELECT doc_id, 1, (simhash >> 6) & 31 FROM s
       |  UNION ALL SELECT doc_id, 2, (simhash >> 11) & 31 FROM s),
       | cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM pieces a JOIN pieces b ON a.pc = b.pc AND a.pv = b.pv AND a.doc_id < b.doc_id)
       |SELECT c.doc_a, c.doc_b,
       |  CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming
       |FROM cand c JOIN s sa ON sa.doc_id = c.doc_a JOIN s sb ON sb.doc_id = c.doc_b
       |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= $simhashHammingMax""".stripMargin

  val simhashSignaturesSql: String = {
    val sums = (0 until simhashBits)
      .map(b => s"SUM(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(",\n  ")
    val combine = (0 until simhashBits)
      .map(b => s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       | h AS (SELECT doc_id, ${hSql("t", 99)} AS hv FROM tok),
       | bits AS (SELECT doc_id,
       |  ${sums}
       |  FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST(${combine} AS BIGINT) AS simhash FROM bits""".stripMargin
  }

  /** 64-bit signature SQL twin: votes drawn from md5(token||'|99')'s first
    * 16 hex nibbles read as TWO exact-int64 halves — hi = nibbles 1-8 =
    * signature bits 63..32, lo = nibbles 9-16 = bits 31..0, mirroring
    * [[graft.functions.ShingleKernel.tokenHash99Wide]]'s big-endian byte
    * read without ever parsing a 64-bit hex value a signed BIGINT can't
    * hold. The bit-63 term (−2⁶³ when set) is added LAST so every partial
    * sum of the combine stays inside signed-int64 range (positive terms
    * bound at 2⁶³−1); the final value is the two's-complement
    * reinterpretation the Scala kernel produces. Replays
    * [[graft.functions.SimHash64]] bit-for-bit.
    */
  val simhashSignatures64Sql: String = {
    val sums = (0 until 64).map { b =>
      val src = if (b < 32) s"(lo >> $b)" else s"(hi >> ${b - 32})"
      s"SUM(CASE WHEN $src & 1 = 1 THEN 1 ELSE -1 END) AS b$b"
    }.mkString(",\n  ")
    val combine = ((0 until 63).map(b =>
      s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)") :+
      "(CASE WHEN b63 > 0 THEN -9223372036854775807 - 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       | h AS (SELECT doc_id,
       |   ('0x' || substr(md5(t || '|99'), 1, 8))::BIGINT AS hi,
       |   ('0x' || substr(md5(t || '|99'), 9, 8))::BIGINT AS lo
       |  FROM tok),
       | bits AS (SELECT doc_id,
       |  ${sums}
       |  FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST(${combine} AS BIGINT) AS simhash FROM bits""".stripMargin
  }

  /** Oracle for [[simhashNearDupPairsWide]]: 4×16-bit pigeonhole pieces +
    * hamming over the 64-bit signature. `>>` fill bits differ across
    * engines on negative signatures but are masked off by `& 65535`
    * (bits 16p..16p+15 of the original are all that survive); `bit_count`/
    * `xor` operate on the two's-complement pattern in both engines.
    */
  lazy val simhashNearDupPairsWideSql: String =
    s"""WITH s AS (${simhashSignatures64Sql.replace("\n", "\n  ")}),
       | pieces AS (
       |  SELECT doc_id, 0 AS pc, simhash & 65535 AS pv FROM s
       |  UNION ALL SELECT doc_id, 1, (simhash >> 16) & 65535 FROM s
       |  UNION ALL SELECT doc_id, 2, (simhash >> 32) & 65535 FROM s
       |  UNION ALL SELECT doc_id, 3, (simhash >> 48) & 65535 FROM s),
       | cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM pieces a JOIN pieces b ON a.pc = b.pc AND a.pv = b.pv AND a.doc_id < b.doc_id)
       |SELECT c.doc_a, c.doc_b,
       |  CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming
       |FROM cand c JOIN s sa ON sa.doc_id = c.doc_a JOIN s sb ON sb.doc_id = c.doc_b
       |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= $simhashHammingMax""".stripMargin

  /** Width-ADAPTIVE oracle for [[simhashNearDupPairs]]: applies the SAME
    * `simhashBitsFor` rule as the engine — the oracle counts the corpus
    * and replays the 16-bit pipeline at or below [[simhashWideThreshold]]
    * docs, the 64-bit pipeline above it. A gate corpus of ANY size now
    * hash-matches by construction; the width switch can never desynchronize
    * the two engines.
    */
  lazy val simhashNearDupPairsAdaptiveSql: String =
    s"""WITH nn AS (SELECT COUNT(*) AS c FROM documents)
       |SELECT * FROM (${simhashNearDupPairsSql.replace("\n", "\n  ")})
       |WHERE (SELECT c FROM nn) <= $simhashWideThreshold
       |UNION ALL
       |SELECT * FROM (${simhashNearDupPairsWideSql.replace("\n", "\n  ")})
       |WHERE (SELECT c FROM nn) > $simhashWideThreshold""".stripMargin
}
