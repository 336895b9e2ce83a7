package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class ZmRec(v: Long, name: String, score: Double)
case class ZmTsRec(id: Long, ts: java.sql.Timestamp)
case class ZmNullRec(id: Long, tag: Option[String])

/** Zone maps: per-batch column min/max lifted from parquet footers into the
  * manifest, pruning whole batch directories driver-side for range
  * predicates — the value-column generalization of rowid manifest pruning.
  */
class ZoneMapSpec extends SparkSpec {

  private def build(): VectorStore[ZmRec] = {
    import spark.implicits._
    val s = VectorStore.create[ZmRec](spark, tmpDir("zm"))
    // 3 batches with disjoint value ranges: [0,100), [100,200), [200,300)
    (0 until 3).foreach { b =>
      s.pushx((0 until 100).map(i => ZmRec(b * 100L + i, f"n${b * 100 + i}%03d", (b * 100 + i) / 10.0)))
    }
    s
  }

  test("stats are recorded per batch and per column") {
    val s = build()
    val m = s.table.manifest
    assert(m.batches.size == 3)
    m.batches.foreach { b =>
      val zs = m.zstats.getOrElse(b.id, Nil)
      assert(zs.exists(_.col == "v"), s"no v stats for batch ${b.id}: $zs")
      assert(zs.exists(_.col == "name"))
      assert(zs.exists(_.col == "score"))
    }
    val first = m.zstats(m.batches.head.id)
    assert(first.find(_.col == "v").get.min == "0" && first.find(_.col == "v").get.max == "99")
    assert(first.find(_.col == "name").get.min == "n000")
  }

  test("long-range predicate prunes to the single overlapping batch") {
    val s = build()
    val hit = s.table.batchesOverlapping(Seq(("v", Some(150L), Some(160L))))
    assert(hit.size == 1, s"expected 1 batch, got ${hit.map(_.id)}")
    // and the pruned scan still returns exactly the filtered rows
    val got = s.table.scanWhere(("v", Some(150L), Some(160L)))
      .orderBy("v").select("v").collect().map(_.getLong(0)).toSeq
    assert(got == (150L to 160L))
  }

  test("double and string predicates prune; results equal full scan + filter") {
    val s = build()
    assert(s.table.batchesOverlapping(Seq(("score", Some(0.0), Some(5.0)))).size == 1)
    assert(s.table.batchesOverlapping(Seq(("name", Some("n250"), Some("n299")))).size == 1)
    val pruned = s.table.scanWhere(("name", Some("n250"), Some("n299")))
      .select("v").orderBy("v").collect().toSeq
    val full = s.table.scan().where(col("name") >= "n250" && col("name") <= "n299")
      .select("v").orderBy("v").collect().toSeq
    assert(pruned == full && pruned.size == 50)
  }

  test("conjunction prunes on every predicate; no-match range reads nothing") {
    val s = build()
    // v in batch 1 but score in batch 0 → no batch satisfies both
    val none = s.table.batchesOverlapping(Seq(
      ("v", Some(150L), Some(160L)), ("score", Some(0.0), Some(5.0))))
    assert(none.isEmpty)
    assert(s.table.scanWhere(
      ("v", Some(150L), Some(160L)), ("score", Some(0.0), Some(5.0))).count() == 0)
    assert(s.table.scanWhere(("v", Some(1000L), None)).count() == 0)
  }

  test("one-sided bounds and unknown columns stay correct") {
    val s = build()
    assert(s.table.batchesOverlapping(Seq(("v", Some(250L), None))).size == 1)
    assert(s.table.batchesOverlapping(Seq(("v", None, Some(50L)))).size == 1)
    // a column with no stats (unknown) never prunes
    assert(s.table.batchesOverlapping(Seq(("nope", Some(1L), Some(2L)))).size == 3)
    assert(s.table.scanWhere(("v", Some(250L), None)).count() == 50)
  }

  test("timestamp zone maps prune with Instant bounds") {
    import spark.implicits._
    val s = VectorStore.create[ZmTsRec](spark, tmpDir("zmts"))
    def ts(day: Int): java.sql.Timestamp =
      java.sql.Timestamp.from(java.time.Instant.parse(f"2024-01-$day%02dT00:00:00Z"))
    (0 until 3).foreach { b =>
      s.pushx((0 until 10).map(i => ZmTsRec(b * 10L + i, ts(b * 10 + i + 1))))
    }
    val lo = java.time.Instant.parse("2024-01-15T00:00:00Z")
    val hi = java.time.Instant.parse("2024-01-18T00:00:00Z")
    val hit = s.table.batchesOverlapping(Seq(("ts", Some(lo), Some(hi))))
    assert(hit.size == 1, s"expected 1 batch, got ${hit.map(_.id)}")
    assert(s.table.scanWhere(("ts", Some(lo), Some(hi))).count() == 4)
  }

  test("all-null column drops stats but never breaks results") {
    import spark.implicits._
    val s = VectorStore.create[ZmNullRec](spark, tmpDir("zmnull"))
    s.pushx((0 until 10).map(i => ZmNullRec(i.toLong, None)))
    s.pushx((10 until 20).map(i => ZmNullRec(i.toLong, Some(s"t$i"))))
    // batch 0 has no non-null tag values → no tag stats → not prunable on tag
    val m = s.table.manifest
    assert(!m.zstats.getOrElse(m.batches.head.id, Nil).exists(_.col == "tag"))
    assert(s.table.batchesOverlapping(Seq(("tag", Some("t10"), Some("t15")))).size >= 1)
    assert(s.table.scanWhere(("tag", Some("t10"), Some("t15"))).count() == 6)
  }

  test("compaction re-lifts zone maps from the compacted files") {
    val s = build()
    s.table.compact()
    val m = s.table.manifest
    assert(m.batches.size == 1)
    val zs = m.zstats.getOrElse(m.batches.head.id, Nil)
    assert(zs.find(_.col == "v").exists(cs => cs.min == "0" && cs.max == "299"))
    assert(s.table.scanWhere(("v", Some(150L), Some(160L))).count() == 11)
  }

  test("zone maps survive manifest round-trip (reopen)") {
    val s = build()
    val reopened = VectorTable.open(spark, s.table.root)
    assert(reopened.batchesOverlapping(Seq(("v", Some(150L), Some(160L)))).size == 1)
  }
}
