package graft.core

import graft.SparkSpec

case class DRec(name: String, n: Long, score: Double, tag: String)
case class DNull(name: String, opt: Option[Long])
case class DNested(name: String, xs: Seq[Long])

/** The direct-parquet point-read path: manifest → footer → one page → one
  * row, no Spark job (the reference's hottest path, readable_cache.rs:68-80
  * misses). Must agree exactly with the Spark read, serve from every batch
  * and row group, handle NULLs, refuse what it can't prove (nested schema),
  * and actually skip the job scheduler (latency class check).
  */
class DirectReadSpec extends SparkSpec {
  import spark.implicits._

  test("pointLocal values agree with the Spark path across batches") {
    val store = VectorStore.create[DRec](spark, tmpDir("direct"))
    store.pushx((0 until 5000).map(i => DRec(s"name-$i", i.toLong, i * 0.5, if (i % 3 == 0) s"t$i" else s"u$i")))
    store.pushx((5000 until 7000).map(i => DRec(s"name-$i", i.toLong, i * 0.5, s"t$i")))

    // every probe must come back via pointLocal (fast path eligible)
    for (i <- Seq(0L, 1L, 4999L, 5000L, 6999L, 1234L, 42L)) {
      val direct = store.table.pointLocal(i)
      assert(direct.isDefined, s"fast path refused rowid $i")
      assert(direct.get("n") == i)
      val tag = if (i >= 5000 || i % 3 == 0) s"t$i" else s"u$i"
      assert(store.get(i).contains(DRec(s"name-$i", i, i * 0.5, tag)))
    }
    assert(store.get(7000L).isEmpty && store.get(-1L).isEmpty)
  }

  test("NULL fields round-trip through the direct path") {
    val store = VectorStore.create[DNull](spark, tmpDir("direct-null"))
    store.pushx(Seq(DNull("a", Some(1L)), DNull("b", None), DNull("c", Some(3L))))
    assert(store.get(1L).contains(DNull("b", None)))
    assert(store.table.pointLocal(1L).exists(_("opt") == null))
  }

  test("nested schemas are refused (fall back to the Spark path) but still correct") {
    val store = VectorStore.create[DNested](spark, tmpDir("direct-nested"))
    store.pushx(Seq(DNested("a", Seq(1L, 2L)), DNested("b", Seq(3L))))
    assert(store.table.pointLocal(0L).isEmpty) // repeated column → refuse
    assert(store.get(1L).contains(DNested("b", Seq(3L)))) // fallback serves it
  }

  test("getMany: small batches serve directly, agree with the job path, stay total") {
    val store = VectorStore.create[DRec](spark, tmpDir("direct-many"))
    store.pushx((0 until 3000).map(i => DRec(s"name-$i", i.toLong, i * 0.5, s"t$i")))
    val keys = Seq(0L, 17L, 2999L, 1234L, 5000L, -3L) // incl. out-of-range
    val got = store.getMany(keys)
    assert(got.keySet == Set(0L, 17L, 2999L, 1234L))
    assert(got(17L) == DRec("name-17", 17L, 8.5, "t17"))
    // past the direct limit the Spark path must produce the same picture
    val bigKeys = (0L until (VectorStore.directBatchLimit + 10L))
    val big = store.getMany(bigKeys)
    assert(big.size == bigKeys.size)
    assert(bigKeys.forall(k => big(k).n == k))
    // nested schema: direct path refuses, fallback still total
    val nested = VectorStore.create[DNested](spark, tmpDir("direct-many-nested"))
    nested.pushx(Seq(DNested("a", Seq(1L)), DNested("b", Seq(2L, 3L))))
    assert(nested.getMany(Seq(0L, 1L))(1L) == DNested("b", Seq(2L, 3L)))
  }

  test("direct reads skip the Spark scheduler (latency class)") {
    val store = VectorStore.create[DRec](spark, tmpDir("direct-lat"))
    store.pushx((0 until 100000).map(i => DRec(s"name-$i", i.toLong, i * 0.5, s"t$i")))
    store.get(50L) // warm footer cache + decoder
    val rnd = new scala.util.Random(7)
    val keys = Vector.fill(50)(rnd.nextInt(100000).toLong)
    // best of two passes: the first may absorb JIT/IO warm-up when the
    // whole suite runs in parallel on a loaded box
    val sec = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      keys.foreach(k => assert(store.get(k).exists(_.n == k)))
      (System.nanoTime() - t0) / 1e9
    }.min
    // Latency CLASS, not absolute wall-clock (an absolute bound flakes on
    // slow/shared hosts — seen at 2.585 s vs a 2.5 s limit on a machine
    // where every Spark op ran 4× slow): the direct path must beat the
    // same 50 keys THROUGH the scheduler by a wide factor. Job-path floor
    // is ~20-150 ms/key; direct is ~2-10 ms/key → 3× is a loose bound.
    val t1 = System.nanoTime()
    keys.foreach(k => assert(store.table.point(k).collect().length == 1))
    val jobSec = (System.nanoTime() - t1) / 1e9
    assert(sec * 3 < jobSec,
      f"direct reads ($sec%.3f s / 50) not decisively faster than job path ($jobSec%.3f s / 50)")
  }
}
