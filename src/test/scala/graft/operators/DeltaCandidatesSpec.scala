package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** `dedup_delta_candidates` is the production shape for continuous ingest:
  * per corpus drop, candidates come from joining the DELTA's stored band
  * rows against the full persisted LSH index — never from re-running the
  * full pair join. Two pins:
  *
  *  1. LOSSLESSNESS — the delta path emits exactly the full recompute's
  *     pairs restricted to those touching the delta (the oracle states the
  *     same thing against DuckDB; here it's also pinned in-test so a
  *     refactor fails fast without the gate);
  *  2. PLAN — the query reads ONLY the index's stored band parquet: no
  *     documents scan, no text column, no re-shingling of anything. That
  *     structural fact IS the 100 TB claim (signature hashing happened at
  *     ingest; the per-drop query is a slim-row join), so it's asserted on
  *     the plan, not trusted from a comment.
  */
class DeltaCandidatesSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("delta candidates ≡ full recompute restricted to pairs touching the delta") {
    val full = pairSet(Dedup.lshCandidatePairs(spark, sf()))
    val cutoff = graft.core.Tables.documents(spark, sf())
      .agg(org.apache.spark.sql.functions.max("doc_id")).head.getLong(0) / 2
    val want = full.filter { case (a, b) => a > cutoff || b > cutoff }
    val got = pairSet(Dedup.deltaCandidatePairs(spark, sf()))
    assert(want.nonEmpty, "expected delta-touching pairs at sf0.001")
    assert(got == want,
      s"delta path diverges: extra=${(got diff want).take(5)} missing=${(want diff got).take(5)}")
    info(s"delta pairs: ${got.size} of ${full.size} full pairs touch the delta")
  }

  test("delta path reads only stored index band rows — no documents scan, no text") {
    val df = Dedup.deltaCandidatePairs(spark, sf())
    val rels = df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation
    }.collect { case fs: HadoopFsRelation => fs }
    assert(rels.nonEmpty, "expected file scans in the delta plan")
    val paths = rels.flatMap(_.location.rootPaths.map(_.toString))
    assert(paths.forall(_.contains("docs-lsh-")),
      s"delta plan scans outside the persisted index: $paths")
    assert(!paths.exists(_.contains("documents.parquet")),
      s"delta plan re-reads the corpus: $paths")
    val cols = rels.flatMap(_.schema.fieldNames).toSet
    assert(!cols.contains("text"), s"delta plan reads document text: $cols")
  }
}
