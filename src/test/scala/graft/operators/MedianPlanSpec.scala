package graft.operators

import graft.SparkSpec

/** The exact median must be a distributed k-th-element selection, not a
  * per-group sort of the full table: with 3 distinct `l_returnflag` values a
  * row-level window would funnel the whole corpus through 3 tasks. The
  * correct plan aggregates a (group, value) histogram FIRST (map-side
  * partials) and only then windows over the histogram, whose size is the
  * number of distinct values — independent of row count.
  */
class MedianPlanSpec extends SparkSpec {

  test("median value matches a brute-force sort at small scale") {
    val rows = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val expected = rows.groupBy(_._1).map { case (flag, vs) =>
      val sorted = vs.map(_._2).sorted
      (flag, (sorted(((sorted.length + 1) / 2) - 1), sorted.length.toLong))
    }
    val got = Relational.medianQuantityPerFlag(spark, sf()).collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("plan windows over the aggregated histogram, not the raw table") {
    val qe = Relational.medianQuantityPerFlag(spark, sf()).queryExecution
    val plan = qe.optimizedPlan
    // Every Window node must sit strictly above an Aggregate (the histogram):
    // a Window whose subtree has no Aggregate is windowing raw rows.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected a window over the histogram")
    windows.foreach { w =>
      val aggBelow = w.child.collect { case a: Aggregate => a }
      assert(aggBelow.nonEmpty,
        s"window over raw rows (full-table per-group sort):\n$w")
    }
  }
}
