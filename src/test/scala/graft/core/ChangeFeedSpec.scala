package graft.core

import graft.SparkSpec

case class CfRec(v: Long, s: String)

/** changesBetween: the append-only CDC surface — version-bounded rowid
  * spans, empty feeds for row-free maintenance commits, pruned reads.
  */
class ChangeFeedSpec extends SparkSpec {

  test("changes between versions are exactly the appended rows") {
    import spark.implicits._
    val s = VectorStore.create[CfRec](spark, tmpDir("cf"))
    (0 until 3).foreach(b => s.pushx((0 until 50).map(i => CfRec(b * 50L + i, s"b$b"))))
    val Seq(v1, v2, v3) = s.table.versions

    def vs(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("v").collect().map(_.getLong(0)).sorted.toSeq

    assert(vs(s.table.changesBetween(0L, v1)) == (0L until 50L))
    assert(vs(s.table.changesBetween(v1, v3)) == (50L until 150L))
    assert(s.table.changesBetween(v2, v2).count() == 0L)
    // pruning evidence: the (v1, v2] feed reads only batch 2's files
    val feedFiles = s.table.changesBetween(v1, v2).inputFiles.length
    val allFiles = s.table.scan().inputFiles.length
    assert(feedFiles < allFiles, s"feed=$feedFiles all=$allFiles")
  }

  test("compaction commits produce an empty change feed") {
    import spark.implicits._
    val s = VectorStore.create[CfRec](spark, tmpDir("cf2"))
    (0 until 2).foreach(b => s.pushx((0 until 20).map(i => CfRec(b * 20L + i, "x"))))
    val before = s.table.manifest.version
    s.table.compact()
    val after = s.table.manifest.version
    assert(after > before)
    assert(s.table.changesBetween(before, after).count() == 0L)
    // and the full history from zero still reads through the compacted view
    assert(s.table.changesBetween(0L, after).count() == 40L)
  }
}
