package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Shuffle-count invariants for the round-2 query surfaces: each plan was
  * `.explain`-inspected and these pins keep a refactor from silently
  * reintroducing a discovery job, a second shuffle, or a full-table window.
  */
class PlanInvariantsSpec extends SparkSpec {

  /** Shuffle exchanges in the prepared plan. Counted from the executed
    * plan's tree string: sparkPlan precedes EnsureRequirements (no
    * exchanges yet) and AQE's AdaptiveSparkPlanExec hides its subtree from
    * `collect`, but its treeString prints the full current tree.
    */
  private def shuffles(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))

  test("pivot with an explicit value list runs no distinct-discovery job") {
    // Spark's pivot double-aggregates: shuffle 1 is the data-sized
    // (status, priority) count with map-side partials; shuffle 2 re-groups
    // the <= |status|x|priority| (15-row) intermediate. The explicit value
    // list is what keeps a third, full-scan distinct job out of the plan.
    assert(shuffles(Relational.pivotOrderStatus(spark, sf())) == 2)
  }

  test("unpivot is map-only (Expand, zero shuffles)") {
    assert(shuffles(Relational.unpivotPartMetrics(spark, sf())) == 0)
  }

  test("histogram is one aggregate shuffle with map-side partials") {
    val df = Relational.histogramOrderTotals(spark, sf())
    assert(shuffles(df) == 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), "expected partial+final hash aggregate")
  }

  test("exact quartiles are one aggregate shuffle (percentile partial state)") {
    assert(shuffles(Relational.quantityQuartiles(spark, sf())) == 1)
  }

  test("gap-fill windows over the joined spine, never the raw events") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    val plan = Events.hourlyGapfill(spark, sf()).queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.child.collect { case j: Join => j }.nonEmpty,
        "ffill window must sit above the spine join")
    }
  }

  test("hot scan paths stay inside whole-stage codegen") {
    // the native kernels (cosine_f, simhash16) and text scoring must not
    // break the codegen span — a non-codegen Expression in the projection
    // would drop the whole stage to interpreted row-at-a-time eval
    for (df <- Seq(
        Similarity.bruteForceKnn(spark, sf()),
        graft.operators.Dedup.simhashSignatures(spark, sf()),
        TextOps.qualityScores(spark, sf()))) {
      val plan = df.queryExecution.executedPlan.toString
      // "*(n) Project ..." is the whole-stage-codegen marker in treeString;
      // the native kernels must appear INSIDE a starred operator
      val codegenLines = plan.linesIterator.filter(_.contains("*(")).mkString("\n")
      assert(codegenLines.nonEmpty, s"no codegen span in:\n$plan")
      assert(Seq("cosinesimilarityf", "simhash16", "Project").exists(codegenLines.contains),
        s"hot projection outside codegen:\n$plan")
    }
  }

  test("lateral top-2 decorrelates to a rank filter, not a per-row re-execution") {
    val plan = Relational.lateralTopParts(spark, sf()).queryExecution.optimizedPlan
    // Catalyst rewrites the correlated LIMIT into window/rank machinery; a
    // surviving LateralJoin would re-run the subquery per outer row.
    assert(!plan.toString.contains("LateralJoin"),
      s"lateral join survived decorrelation:\n$plan")
  }

  test("star joins never force-broadcast an SF-growing table (q3/q5/q7/q9/q10 policy)") {
    // customer (~150M rows at sf1000), supplier (~10M), and part (~200M)
    // grow with scale: a broadcast() hint on them — or on ANY post-filter
    // slice of them, which still grows linearly with SF — is a driver OOM
    // on a real cluster. Only fixed-cardinality dims (nation: 25, region:
    // 5) and small-LIMIT-bounded subtrees (q10's top-20) may carry the
    // hint; mid-size sides are AQE's call at runtime, and selective-filter
    // pruning goes through the runtime bloom filter (bounded size,
    // executor-built) instead. No other carve-outs: this pin keeps both
    // the round-5 defect (forced supplier broadcast) and the round-7 one
    // (q9's SF-growing key-list broadcast) from returning.
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, HintInfo, Join, LogicalPlan, BROADCAST}
    import org.apache.spark.sql.catalyst.expressions.IntegerLiteral
    for ((qname, df) <- Seq(
        "q3" -> Relational.q3ShippingPriority(spark, sf()),
        "q5" -> Relational.q5LocalSupplier(spark, sf()),
        "q7" -> Relational.q7NationVolume(spark, sf()),
        "q9" -> Relational.q9ProductProfit(spark, sf()),
        "q10" -> Relational.q10ReturnedRevenue(spark, sf()))) {
      val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
      def checkSide(side: LogicalPlan, hint: Option[HintInfo]): Unit =
        if (hint.exists(_.strategy.contains(BROADCAST))) {
          // Only a SMALL literal LIMIT above the leaves bounds the
          // broadcast at any SF — a large limit over an SF-growing table
          // is still a driver-memory hazard, so it does not exempt.
          val limited = side.collectFirst {
            case GlobalLimit(IntegerLiteral(n), _) if n <= 1000 => n
          }.isDefined
          val leaves = side.collectLeaves().map(_.toString.toLowerCase).mkString(" ")
          if (!limited)
            for (grown <- Seq("customer", "supplier", "part", "orders", "lineitem"))
              assert(!leaves.contains(grown),
                s"$qname force-broadcasts SF-growing table '$grown'")
        }
      joins.foreach { j => checkSide(j.left, j.hint.leftHint); checkSide(j.right, j.hint.rightHint) }
    }
  }

  test("q9 prunes lineitem with a runtime bloom filter, not a key-list broadcast") {
    // The filtered part-key list grows with SF, so q9 must not collect it
    // to the driver; the scale path is Spark's runtime bloom-filter
    // rewrite on the fact side. Thresholds are lowered here because at
    // sf0.001 the scan is below the default application-side minimum —
    // the pin is that the rewrite FIRES on this plan shape once the scan
    // is big enough, which is exactly the 100 TB condition.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val plan = Relational.q9ProductProfit(spark, sf()).queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter pruning lineitem in q9:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("no declared query plans a cartesian product (corpus-wide scale guard)") {
    // Planning-only sweep over EVERY SparkEntry query: a cartesian product
    // anywhere is the one join shape that can never survive a scale-up, so
    // a refactor reintroducing one (e.g. by dropping a join key or a
    // broadcast hint) fails here before it ships. BroadcastNestedLoopJoin
    // is allowed — the theta queries use it deliberately, dims-only.
    val d = sf()
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, d).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("snapshot query plans only the AS OF manifest's batches (time-travel source pruning)") {
    val t = Relational.ordersZoneTable(spark, sf())
    val headBatches = t.manifest.batches.size
    assert(headBatches == 7, s"expected 7 yearly batches, got $headBatches")
    val snapFiles = Relational.snapshotOrdersAsof(spark, sf()).inputFiles
    // versions(3) references exactly the first 4 yearly batches; the other
    // 3 years are never listed, let alone scanned
    val batchDirs = snapFiles.map(f => f.replaceAll("/[^/]*$", "")).distinct
    assert(batchDirs.length == 4,
      s"snapshot should plan 4 of $headBatches batch dirs, planned ${batchDirs.length}:\n${batchDirs.mkString("\n")}")
  }
}
