package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class KV(k: Long, v: String)

/** MERGE/upsert semantics (merge-on-read delete vectors): liveScan is the
  * logical after-image, the physical rowid surface stays append-only, old
  * versions remain time-travelable, masks accumulate across upserts and
  * survive append/compact/vacuum.
  */
class UpsertSpec extends SparkSpec {

  private def mkTable(prefix: String): VectorTable =
    VectorTable.create(spark, tmpDir(prefix) + "/t")

  test("upsert replaces matched keys in liveScan; physical surface untouched") {
    import spark.implicits._
    val t = mkTable("upsert")
    t.append(Seq(KV(1, "a"), KV(2, "b"), KV(3, "c")).toDF())
    val v1 = t.versions.last

    val start = t.upsertBy(Seq(KV(2, "B2"), KV(4, "d")).toDF(), Seq("k"))
    assert(start == 3L) // appended after the existing rows

    // logical view: one row per key, key 2 updated
    val live = t.liveScan().select("k", "v").as[KV].collect().sortBy(_.k)
    assert(live.toSeq == Seq(KV(1, "a"), KV(2, "B2"), KV(3, "c"), KV(4, "d")))
    assert(t.liveCount == 4L)

    // physical append-only surface: all 5 rows, rowids dense
    assert(t.length == 5L)
    assert(t.scan().count() == 5L)
    assert(t.point(1L).select("v").head().getString(0) == "b") // pre-image by rowid

    // time travel to before the upsert
    assert(t.scanAt(v1).count() == 3L)
  }

  test("masks accumulate across upserts and survive plain appends") {
    import spark.implicits._
    val t = mkTable("upsert-acc")
    t.append(Seq(KV(1, "a"), KV(2, "b")).toDF())
    t.upsertBy(Seq(KV(1, "a2")).toDF(), Seq("k"))
    t.upsertBy(Seq(KV(2, "b2"), KV(1, "a3")).toDF(), Seq("k"))
    // a2 (the first upsert's row) must now be masked too
    val live = t.liveScan().select("k", "v").as[KV].collect().sortBy(_.k)
    assert(live.toSeq == Seq(KV(1, "a3"), KV(2, "b2")))
    assert(t.liveCount == 2L && t.length == 5L)

    t.append(Seq(KV(9, "z")).toDF())
    assert(t.liveCount == 3L) // mask carried through the append commit
    assert(t.liveScan().where(col("k") === 9).count() == 1L)
  }

  test("upsert with no matching keys is a plain append; empty-table upsert works") {
    import spark.implicits._
    val t = mkTable("upsert-nomatch")
    t.upsertBy(Seq(KV(1, "a")).toDF(), Seq("k")) // empty table
    t.upsertBy(Seq(KV(2, "b")).toDF(), Seq("k")) // no overlap
    assert(t.liveCount == 2L)
    assert(t.liveScan().count() == 2L)
    // a no-overlap upsert must NOT leave a mask behind: liveScan stays a
    // plain scan (no anti-join) and no redundant metadata commit happens
    assert(t.manifest.maskPath.isEmpty)
  }

  test("mask survives compaction and vacuum retention") {
    import spark.implicits._
    val t = mkTable("upsert-compact")
    t.append(Seq(KV(1, "a"), KV(2, "b")).toDF())
    t.upsertBy(Seq(KV(1, "a2")).toDF(), Seq("k"))
    t.compact()
    assert(t.liveScan().select("k", "v").as[KV].collect().sortBy(_.k).toSeq ==
      Seq(KV(1, "a2"), KV(2, "b")))
    t.vacuum(retainVersions = 1)
    // mask sidecar must not be vacuumed away
    assert(t.liveScan().select("k", "v").as[KV].collect().sortBy(_.k).toSeq ==
      Seq(KV(1, "a2"), KV(2, "b")))
    assert(t.liveCount == 2L)
  }
}
