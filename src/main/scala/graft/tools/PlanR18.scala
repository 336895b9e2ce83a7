package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Round-18 optimization evidence: formatted plans for the hot INTERNAL
  * chains of the driver-program measurement faces this round touched.
  * The declared faces themselves return tiny driver-assembled frames
  * (their `.explain` is a LocalTableScan), so the honest plan artifact is
  * the chain that dominates each face's wall clock — captured here in
  * both the before form (fresh per-k signature, still expressible through
  * the unchanged `signaturesOfK`) and the after form (k-prefix projection
  * of the shared checkpointed max-width signature).
  *
  * Run: sbt "runMain graft.operators.PlanR18 plans/r18"
  */
object PlanR18 {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r18")
    Files.createDirectories(Paths.get(outDir))
    val spark = graft.core.GraftSession.local("graft-plans-r18", "32")
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"$name.txt"), plan)
      println(s"wrote $outDir/$name.txt")
    }
    val docs = graft.core.Tables.documents(spark, d)

    // dedup_lsh_tuning / dedup_lsh_recall shared signature chain, config
    // (k=6, b=3, r=2): BEFORE = fresh 6-wide signature pass over documents
    // (one such pass per distinct k in the sweep); AFTER = first-6
    // projection of the ONE checkpointed 64-wide signature frame.
    dump("lsh_sweep_config_chain_before",
      Dedup.bandedPairsAdaptive(
        Dedup.signaturesOfK(docs, 6),
        Dedup.bandsOfK(_, 3, 2), Seq("band", "bkey")))
    val sigMax = Dedup.signaturesOfK(docs, 64).localCheckpoint()
    dump("lsh_sweep_config_chain_after",
      Dedup.bandedPairsAdaptive(
        Dedup.sigPrefixK(sigMax, 6),
        Dedup.bandsOfK(_, 3, 2), Seq("band", "bkey")))

    // declared queries whose plan the AQE SMJ->SHJ conversion touches —
    // dumped under a caller-chosen suffix so the same invocation records
    // the before (GRAFT_SPARK_CONF=...Threshold=0) and after (default)
    // forms.
    val suffix = if (args.length > 1) args(1) else ""
    if (suffix.nonEmpty)
      Seq("q5_local_supplier", "q8_market_share", "q9_product_profit",
        "q3_shipping_priority", "top_order_per_customer").foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, d)
        // execute df's OWN QueryExecution first (collect drives it): the
        // SMJ->SHJ conversion is an AQE RUNTIME re-optimization, so only
        // the executed plan (isFinalPlan=true) shows the strategy run
        df.collect()
        dump(s"$name$suffix", df)
      }
    spark.stop()
  }
}
