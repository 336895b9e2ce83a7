package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Round-12: the delta-vs-index discipline extended beyond MinHash banding
  * to the SimHash piece buckets and the containment prefix index
  * ([[SimHashIndex]], [[ContainmentIndex]]) — continuous ingest needs every
  * near-dup family member to answer "what does this drop collide with?"
  * from stored rows. Same two pins as DeltaCandidatesSpec per face:
  * LOSSLESSNESS (delta face ≡ full recompute restricted to delta-touching
  * pairs — also the oracle's statement) and PLAN (only the persisted
  * index's parquet is scanned: no documents read, no text column, no
  * re-shingling/re-hashing of anything).
  */
class DeltaIndexSpec extends SparkSpec {

  private def scanPaths(df: org.apache.spark.sql.DataFrame): (Seq[String], Set[String]) = {
    val rels = df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation
    }.collect { case fs: HadoopFsRelation => fs }
    assert(rels.nonEmpty, "expected file scans in the delta plan")
    (rels.flatMap(_.location.rootPaths.map(_.toString)),
      rels.flatMap(_.schema.fieldNames).toSet)
  }

  private def cutoffOf(d: String): Long =
    graft.core.Tables.documents(spark, d)
      .agg(org.apache.spark.sql.functions.max("doc_id")).head.getLong(0) / 2

  test("delta SimHash ≡ full 64-bit recompute restricted to delta-touching pairs") {
    val d = sf()
    def pairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Int] =
      df.select("doc_a", "doc_b", "hamming").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val full = pairs(Dedup.simhashNearDupPairsWide(spark, d))
    val cutoff = cutoffOf(d)
    val want = full.filter { case ((a, b), _) => a > cutoff || b > cutoff }
    val got = pairs(Dedup.deltaSimhashPairs(spark, d))
    assert(want.nonEmpty, "expected delta-touching simhash pairs at sf0.001")
    assert(got == want,
      s"delta simhash diverges: extra=${(got.keySet -- want.keySet).take(5)} " +
        s"missing=${(want.keySet -- got.keySet).take(5)}")
  }

  test("delta SimHash plan reads only stored index rows — no documents scan, no text") {
    val (paths, cols) = scanPaths(Dedup.deltaSimhashPairs(spark, sf()))
    assert(paths.forall(_.contains("docs-simhash-")),
      s"delta simhash plan scans outside the persisted index: $paths")
    assert(!cols.contains("text"), s"delta simhash plan reads document text: $cols")
  }

  test("delta containment ≡ full containment join restricted to delta-touching pairs") {
    val d = sf()
    def pairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), (Long, Long)] =
      df.select("doc_a", "doc_b", "inter", "n_min").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val full = pairs(Dedup.containmentPairs(spark, d))
    val cutoff = cutoffOf(d)
    val want = full.filter { case ((a, b), _) => a > cutoff || b > cutoff }
    val got = pairs(Dedup.deltaContainmentPairs(spark, d))
    assert(want.nonEmpty, "expected delta-touching containment pairs at sf0.001")
    assert(got == want,
      s"delta containment diverges: extra=${(got.keySet -- want.keySet).take(5)} " +
        s"missing=${(want.keySet -- got.keySet).take(5)}")
  }

  test("delta containment plan reads only stored index rows — no documents scan, no text") {
    val (paths, cols) = scanPaths(Dedup.deltaContainmentPairs(spark, sf()))
    assert(paths.forall(_.contains("docs-contain-")),
      s"delta containment plan scans outside the persisted index: $paths")
    assert(!cols.contains("text"), s"delta containment plan reads document text: $cols")
  }

  test("an EMPTY SimHashIndex is readable and refresh populates it (round-12 ADVICE)") {
    import spark.implicits._
    val table = graft.core.VectorTable.create(spark, tmpDir("simhash-empty") + "/t")
    val idx = SimHashIndex.build(table, tmpDir("simhash-empty") + "/idx")
    // before the fix, `signatures` threw path-not-found on an empty build
    assert(idx.signatures.count() == 0L)
    assert(idx.signatures.columns.toSeq ==
      Seq("doc_id", graft.core.VectorTable.ROWID, "simhash"))
    table.append(Seq((0L, "alpha beta gamma"), (1L, "delta epsilon zeta"))
      .toDF("doc_id", "text"))
    val fresh = idx.refresh(table)
    assert(fresh.signatures.count() == 2L)
  }

  test("delta SimHash collapse body ≡ flat blocked join on a clique fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val page = "copy copy copy page body with enough tokens here"
    val rnd = new scala.util.Random(99)
    val docs = ((0L until 300L).map(i => (i, page)) ++
      (400L until 460L).map(i => (i, (0 until 8).map(_ => s"w${rnd.nextInt(300)}").mkString(" "))))
      .toDF("doc_id", "text")
    val sig = docs.select(col("doc_id"),
      graft.functions.TextFunctions.simhash64(col("text")).as("simhash")).localCheckpoint()
    val cutoff = 250L
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val flat = pairs(Dedup.deltaPairsBlocked(Dedup.simhashPieces(sig, 64),
      Dedup.simhashPieces(sig.where(col("doc_id") > cutoff), 64), Seq("pc", "pv")))
    val adaptive = pairs(Dedup.deltaSimhashCandidates(sig, cutoff))
    assert(flat.forall { case (a, b) => a > cutoff || b > cutoff })
    assert(flat.size >= 250 * 50, "fixture lost its delta-clique structure")
    assert(adaptive == flat,
      s"delta simhash collapse diverges: extra=${(adaptive -- flat).take(5)} " +
        s"missing=${(flat -- adaptive).take(5)}")
  }

  test("delta spans ≡ full repeated-span scan restricted to delta-touching hashes") {
    val d = sf()
    // full recompute, filtered to hashes with a delta occurrence — the
    // oracle's statement, replayed here through the Spark kernel
    val grams = graft.core.Tables.documents(spark, d)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.explode(graft.functions.TextFunctions
          .rollingHashes(org.apache.spark.sql.functions.col("text"),
            Dedup.repeatedSpanWindow, Dedup.repeatedSpanStride)).as("gram_hash"))
    val cutoff = cutoffOf(d)
    import org.apache.spark.sql.functions._
    val touched = grams.where(col("doc_id") > cutoff).select("gram_hash").distinct()
    val want = grams.join(touched, Seq("gram_hash"), "left_semi")
      .groupBy("gram_hash")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occurrences"),
        min("doc_id").as("first_doc"))
      .where(col("n_docs") >= Dedup.repeatedSpanMinDocs)
      .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("gram_hash"))
      .limit(Dedup.repeatedSpanTopK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val got = Dedup.deltaSpanStats(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(want.nonEmpty, "expected delta-touching repeated spans at sf0.001")
    assert(got == want, s"delta spans diverge: got=${got.take(3)} want=${want.take(3)}")
  }

  test("delta spans plan reads only stored index rows — no documents scan, no text") {
    val (paths, cols) = scanPaths(Dedup.deltaSpanStats(spark, sf()))
    assert(paths.forall(_.contains("docs-spans-")),
      s"delta spans plan scans outside the persisted index: $paths")
    assert(!cols.contains("text"), s"delta spans plan reads document text: $cols")
  }
}
