package graft.functions

import graft.SparkSpec

/** Guards the native kernels against SILENT codegen regressions: with
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` (and WSCG fallback off) a
  * Janino compile failure throws instead of quietly demoting the plan to
  * interpreted mode. Round 4 caught exactly that: a generated line starting
  * with "||" lost its margin chars to Block's nested stripMargin and
  * pq_adc ran interpreted everywhere it appeared outside WSCG.
  */
class CodegenFallbackSpec extends SparkSpec {

  private val kernelQueries = Seq(
    "ann_pq_codes", "ann_pq_adc_search", "ann_sq_search", "ann_sq_error_stats",
    "dedup_simhash", "dedup_minhash_signatures", "mm_frame_energy",
    "text_fingerprints", "knn_brute_force", "embedding_near_dups",
    // sorted_intersect_count in all three dedup verification paths
    "dedup_jaccard_verified", "dedup_containment", "dedup_exact_jaccard_join",
    // pq_adc with the query as a COLUMN (the batch face)
    "ann_ivfpq_batch_search")

  test("kernel queries compile under CODEGEN_ONLY (no interpreter fallback)") {
    val conf = spark.conf
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      kernelQueries.foreach { name =>
        val n = graft.SparkEntry.queries(name)(spark, sf()).count()
        assert(n >= 0, s"$name failed under CODEGEN_ONLY")
      }
    } finally {
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(v =>
        conf.set("spark.sql.codegen.factoryMode", v))
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(v =>
        conf.set("spark.sql.codegen.fallback", v))
    }
  }
}
