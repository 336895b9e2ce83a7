package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** ReadableCache semantics (reference: src/cache/readable_cache.rs) — pure
  * driver-side logic, no Spark needed: LRU hit/miss, bulk bypass, capacity
  * eviction, manual warm-up.
  */
class ReadCachedStoreSpec extends AnyFunSuite {

  private def backed(data: Vector[String]): (ReadCachedStore[String], () => Long) = {
    var fetches = 0L
    val c = new ReadCachedStore[String](
      i => { fetches += 1; data.lift(i.toInt) },
      (i, n) => if (i + n <= data.size) Some(data.slice(i.toInt, (i + n).toInt)) else None,
      capacity = 3)
    (c, () => fetches)
  }

  test("getting: miss fetches + populates; hit skips backing store (readable_cache.rs:68-80)") {
    val (c, fetches) = backed(Vector("a", "b", "c"))
    assert(c.getting(0).contains("a"))
    assert(fetches() == 1)
    assert(c.getting(0).contains("a"))
    assert(fetches() == 1) // served from LRU
    assert(c.stats == ((1L, 1L)))
  }

  test("gettingLot bypasses the cache (readable_cache.rs:83-85)") {
    val (c, fetches) = backed(Vector("a", "b", "c"))
    assert(c.gettingLot(0, 3).contains(Seq("a", "b", "c")))
    assert(c.cachedCount == 0)
    assert(fetches() == 0)
  }

  test("LRU evicts eldest beyond capacity, recency updated on access") {
    val (c, _) = backed(Vector("a", "b", "c", "d", "e"))
    c.getting(0); c.getting(1); c.getting(2)
    c.getting(0)   // refresh 0's recency
    c.getting(3)   // evicts 1 (eldest), not 0
    assert(c.cachedCount == 3)
    val before = c.stats
    c.getting(0)   // still cached → hit
    assert(c.stats._1 == before._1 + 1)
  }

  test("manual warm-up (add_to_cache/add_bulk_to_cache, readable_cache.rs:88-108)") {
    val (c, fetches) = backed(Vector("a", "b", "c"))
    c.addBulkToCache(0, Seq("a", "b"))
    assert(c.getting(1).contains("b"))
    assert(fetches() == 0)
  }

  test("miss on nonexistent index does not populate the cache") {
    val (c, _) = backed(Vector("a"))
    assert(c.getting(5).isEmpty)
    assert(c.cachedCount == 0)
  }
}
