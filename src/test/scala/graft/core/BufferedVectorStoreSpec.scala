package graft.core

import graft.SparkSpec

/** WritableCache semantics (reference: src/cache/writable_cache.rs):
  * acknowledge-before-durability, merged read view with straddle routing,
  * threshold-triggered background flush, flush-on-close.
  */
case class BRec(v: Long)

class BufferedVectorStoreSpec extends SparkSpec {

  private def fresh(maxItems: Int = 1000000): (VectorStore[BRec], BufferedVectorStore[BRec]) = {
    import spark.implicits._
    val base = VectorStore.create[BRec](spark, tmpDir("bufstore"))
    (base, new BufferedVectorStore[BRec](base, maxItems))
  }

  test("merged len = committed + buffered (writable_cache.rs:210-212)") {
    val (base, buf) = fresh()
    base.pushx((0 until 10).map(i => BRec(i.toLong)))
    buf.pushx((10 until 15).map(i => BRec(i.toLong)))
    assert(buf.len == 15L)
    assert(base.len == 10L) // not yet durable
    buf.close()
  }

  test("pull routes db vs buffer by base length (writable_cache.rs:222-246)") {
    val (base, buf) = fresh()
    base.pushx(Seq(BRec(0L), BRec(1L)))
    buf.pushx(Seq(BRec(2L), BRec(3L)))
    assert(buf.pull(1) == BRec(1L)) // from backing store
    assert(buf.pull(3) == BRec(3L)) // from buffer
    intercept[IndexOutOfBoundsException](buf.pull(4))
    buf.close()
  }

  test("getx straddle: db part + buffer prefix (writable_cache.rs:248-298)") {
    val (base, buf) = fresh()
    base.pushx((0 until 10).map(i => BRec(i.toLong)))
    buf.pushx((10 until 20).map(i => BRec(i.toLong)))
    assert(buf.getx(8, 6).exists(_.map(_.v) == (8L until 14L)))
    assert(buf.getx(12, 4).exists(_.map(_.v) == (12L until 16L))) // all-buffer
    assert(buf.getx(0, 21).isEmpty) // OOB
    buf.close()
  }

  test("background flusher drains at threshold (writable_cache.rs:78-95)") {
    val (base, buf) = fresh(maxItems = 100)
    buf.pushx((0 until 150).map(i => BRec(i.toLong)))
    // poll for the daemon flush instead of a fixed sleep
    val deadline = System.currentTimeMillis() + 30000
    while (base.len < 150L && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(base.len == 150L)
    assert(buf.bufferedCount == 0)
    buf.close()
  }

  test("close drains remaining buffer (flush-on-drop, writable_cache.rs:162-185)") {
    val (base, buf) = fresh()
    buf.pushx((0 until 7).map(i => BRec(i.toLong)))
    buf.close()
    assert(base.len == 7L)
    assert(base.getall().get.map(_.v) == (0L until 7L))
  }

  test("mergedView unions committed and in-flight rows") {
    val (base, buf) = fresh()
    base.pushx(Seq(BRec(1L)))
    buf.pushx(Seq(BRec(2L)))
    assert(buf.mergedView().collect().map(_.v).sorted.toSeq == Seq(1L, 2L))
    buf.close()
  }

  test("buffer introspection: each_len + buffer-relative reads (writable_cache.rs:119-159)") {
    val (base, buf) = fresh()
    base.pushx((0 until 3).map(i => BRec(i.toLong)))
    buf.pushx((10 until 14).map(i => BRec(i.toLong)))
    assert(buf.baseLen == 3L && buf.cacheLen == 4)
    assert(buf.eachLen == ((4L, 3L, 7L)))
    // buffer-relative, not global rowid: index 0 is the first UNFLUSHED row
    assert(buf.getObjFromCache(0L).contains(BRec(10L)))
    assert(buf.gettingObjFromCache(3L) == BRec(13L))
    assert(buf.getObjsFromCache(1L, 2L).contains(Seq(BRec(11L), BRec(12L))))
    assert(buf.getObjFromCache(4L).isEmpty)
    assert(buf.getObjsFromCache(3L, 2L).isEmpty)
    intercept[IndexOutOfBoundsException](buf.gettingObjFromCache(4L))
    buf.flush()
    assert(buf.eachLen == ((0L, 7L, 7L)))
    assert(buf.getObjFromCache(0L).isEmpty)
    buf.close()
  }
}
