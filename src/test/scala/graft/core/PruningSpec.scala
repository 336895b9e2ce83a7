package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class PrRec(v: Long, payload: String)

/** Scale-behavior evidence: point/range reads must not touch all data.
  * Manifest pruning limits which batch directories are even listed; the
  * pushed _rowid filter then prunes parquet row groups.
  */
class PruningSpec extends SparkSpec {

  private def build(): VectorStore[PrRec] = {
    import spark.implicits._
    val s = VectorStore.create[PrRec](spark, tmpDir("prune"))
    // 4 batches of 1000 rows → rowid ranges [0,1000), [1000,2000), ...
    (0 until 4).foreach { b =>
      s.pushx((0 until 1000).map(i => PrRec(b * 1000L + i, s"p$b-$i")))
    }
    s
  }

  test("range read lists only overlapping batch files (manifest pruning)") {
    val s = build()
    val all = s.table.scan().inputFiles.length
    val one = s.table.range(2500, 10).inputFiles.length
    assert(all > one, s"expected pruning: all=$all hit=$one")
    // only batch 2 (rowids [2000,3000)) overlaps [2500,2510)
    val batchDirs = s.table.range(2500, 10).inputFiles.map(_.split("/data/batch-")(1).take(8)).distinct
    assert(batchDirs.length == 1)
  }

  test("point read plan pushes the rowid predicate to the parquet scan") {
    val s = build()
    val plan = s.table.point(1234).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(_rowid") || plan.contains("IsNotNull(_rowid")),
      s"rowid filter not pushed:\n$plan")
  }

  test("straddling range still returns exact rows after pruning") {
    val s = build()
    assert(s.pullx(1995, 10).map(_.v) == (1995L until 2005L))
  }

  test("scan reads all batches") {
    val s = build()
    assert(s.table.scan().count() == 4000L)
  }
}
