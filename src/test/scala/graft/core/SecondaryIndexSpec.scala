package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions.col

case class SIRec(user: String, seq: Long, amount: Double)

/** Secondary (key → rowid) index: sorted range-partitioned layout, pushed
  * equality/range lookups, rowid-ordered findBy through the store's point
  * paths, and staleness detection against the table version.
  */
class SecondaryIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(name: String): (VectorStore[SIRec], String) = {
    val store = VectorStore.create[SIRec](spark, tmpDir(s"$name-t"))
    store.pushx((0 until 5000).map(i => SIRec(s"user-${i % 50}", i.toLong, i * 1.5)))
    (store, tmpDir(s"$name-ix"))
  }

  test("lookup returns exactly the rowids of the key, findBy the records in rowid order") {
    val (store, ixRoot) = freshStore("six")
    val ix = SecondaryIndex.build(store.table, "user", ixRoot)
    val ids = ix.lookup("user-7")
    assert(ids.size == 100) // 5000 rows / 50 users
    assert(ids.forall(_ % 50 == 7))
    val recs = store.findBy(ix, "user-7")
    assert(recs.size == 100)
    assert(recs.map(_.seq) == recs.map(_.seq).sorted) // rowid order
    assert(recs.forall(_.user == "user-7"))
    assert(ix.lookup("user-999").isEmpty)
  }

  test("range lookup over the sorted key layout") {
    val (store, ixRoot) = freshStore("six-range")
    val ix = SecondaryIndex.build(store.table, "user", ixRoot)
    // lexicographic: user-10, user-11, ..., user-19 → 10 users × 100 rows
    assert(ix.lookupRange("user-10", "user-19").size == 1000)
  }

  test("the key predicate is pushed to the index scan") {
    val (store, ixRoot) = freshStore("six-push")
    SecondaryIndex.build(store.table, "user", ixRoot)
    val plan = spark.read.parquet(s"$ixRoot/data").where(col("k") === "user-7")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(k,user-7)"),
      s"expected pushed key filter in:\n$plan")
  }

  test("refresh indexes only the appended rowid span, incrementally") {
    val (store, ixRoot) = freshStore("six-refresh")
    val ix = SecondaryIndex.build(store.table, "user", ixRoot)
    assert(ix.indexedLength == 5000L)
    store.pushx((5000 until 5100).map(i => SIRec(s"user-${i % 50}", i.toLong, 0.0)))
    val ix2 = ix.refresh(store.table)
    assert(!ix2.isStale(store.table) && ix2.indexedLength == 5100L)
    assert(ix2.lookup("user-7").size == 102) // 100 original + 2 appended
    assert(store.findBy(ix2, "user-7").map(_.seq).max == 5057L)
    // no-op refresh returns the same handle
    assert(ix2.refresh(store.table) eq ix2)
    // reopen round-trips the incremental metadata
    val reopened = SecondaryIndex.open(spark, ixRoot, "user")
    assert(reopened.indexedLength == 5100L && reopened.lookup("user-7").size == 102)
  }

  test("staleness: a later append flags the index, rebuild clears it") {
    val (store, ixRoot) = freshStore("six-stale")
    val ix = SecondaryIndex.build(store.table, "user", ixRoot)
    assert(!ix.isStale(store.table))
    store.pushx(Seq(SIRec("user-7", 9999L, 1.0)))
    assert(ix.isStale(store.table))
    assert(ix.lookup("user-7").size == 100) // pre-append view, consistent
    val ix2 = SecondaryIndex.build(store.table, "user", ixRoot)
    assert(!ix2.isStale(store.table))
    assert(ix2.lookup("user-7").size == 101)
    // reopen round-trips the build version
    val reopened = SecondaryIndex.open(spark, ixRoot, "user")
    assert(!reopened.isStale(store.table) && reopened.lookup("user-7").size == 101)
  }
}
