package graft.core

import graft.SparkSpec

case class TRec(v: Long)

/** Manifest time travel: every committed version stays readable (batches
  * are never deleted), including across a compaction.
  */
class TimeTravelSpec extends SparkSpec {

  test("scanAt reads historical versions; lengthAt is O(1)") {
    import spark.implicits._
    val s = VectorStore.create[TRec](spark, tmpDir("tt"))
    s.pushx((0 until 10).map(i => TRec(i.toLong)))
    s.pushx((10 until 25).map(i => TRec(i.toLong)))
    s.pushx((25 until 30).map(i => TRec(i.toLong)))
    val t = s.table
    assert(t.versions == Seq(1L, 2L, 3L))
    assert(t.lengthAt(1) == 10L && t.lengthAt(2) == 25L && t.lengthAt(3) == 30L)
    assert(t.scanAt(2).count() == 25L)
    assert(t.scanAt(1).agg(org.apache.spark.sql.functions.max("v")).head().getLong(0) == 9L)
  }

  test("pre-compaction versions stay readable after compact") {
    import spark.implicits._
    val s = VectorStore.create[TRec](spark, tmpDir("ttc"))
    (0 until 4).foreach(b => s.pushx((0 until 5).map(i => TRec(b * 5L + i))))
    s.table.compact()
    assert(s.table.manifest.batches.size == 1)
    // version 2 = after two appends, before compaction
    assert(s.table.scanAt(2).count() == 10L)
    assert(s.table.scan().count() == 20L)
  }
}
