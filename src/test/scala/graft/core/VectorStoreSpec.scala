package graft.core

import graft.SparkSpec

/** VectorEngine<T> trait semantics (reference: src/vector_engine.rs:10-54)
  * over the parquet-backed store: totality of get/getx, partiality of
  * pull/pullx, getall None-on-empty, dense rowids across batches.
  */
case class VRec(name: String, n: Long)

class VectorStoreSpec extends SparkSpec {

  private def freshStore(): VectorStore[VRec] = {
    import spark.implicits._
    VectorStore.create[VRec](spark, tmpDir("vstore"))
  }

  test("empty store: len 0, isEmpty, getall None (vector_engine.rs:47-53)") {
    val s = freshStore()
    assert(s.len == 0L)
    assert(s.isEmpty)
    assert(s.getall().isEmpty)
    assert(s.get(0).isEmpty)
  }

  test("pushx preserves input order; rowids dense across batches") {
    val s = freshStore()
    s.pushx((0 until 50).map(i => VRec(s"r$i", i.toLong)))
    s.pushx((50 until 80).map(i => VRec(s"r$i", i.toLong)))
    assert(s.len == 80L)
    assert(s.getall().get.map(_.n) == (0L until 80L))
  }

  test("get is total: Some in bounds, None OOB (vector_engine.rs:33-39)") {
    val s = freshStore()
    s.pushx((0 until 10).map(i => VRec(s"r$i", i.toLong)))
    assert(s.get(9).contains(VRec("r9", 9L)))
    assert(s.get(10).isEmpty)
    assert(s.get(-1).isEmpty)
  }

  test("getx bound is index+count <= len (vector_engine.rs:40-46)") {
    val s = freshStore()
    s.pushx((0 until 10).map(i => VRec(s"r$i", i.toLong)))
    assert(s.getx(5, 5).exists(_.map(_.n) == (5L until 10L)))
    assert(s.getx(5, 6).isEmpty)
    assert(s.getx(0, 0).exists(_.isEmpty))
  }

  test("pull/pullx throw on OOB (reference panics: vector_engine.rs:27-28)") {
    val s = freshStore()
    s.pushx(Seq(VRec("a", 1L)))
    assert(s.pull(0) == VRec("a", 1L))
    intercept[IndexOutOfBoundsException](s.pull(1))
    intercept[IndexOutOfBoundsException](s.pullx(0, 2))
  }

  test("range read straddling batch boundary stays ordered") {
    val s = freshStore()
    s.pushx((0 until 30).map(i => VRec(s"r$i", i.toLong)))
    s.pushx((30 until 60).map(i => VRec(s"r$i", i.toLong)))
    assert(s.pullx(25, 10).map(_.n) == (25L until 35L))
  }

  test("reopen sees committed manifest (O(1) length, no data scan)") {
    val s = freshStore()
    s.pushx((0 until 20).map(i => VRec(s"r$i", i.toLong)))
    val reopened = {
      import spark.implicits._
      VectorStore.open[VRec](spark, s.table.root)
    }
    assert(reopened.len == 20L)
    assert(reopened.get(19).contains(VRec("r19", 19L)))
  }

  test("getMany: batched point reads in one job, OOB ids absent") {
    val s = freshStore()
    s.pushx((0 until 30).map(i => VRec(s"r$i", i.toLong)))
    s.pushx((30 until 60).map(i => VRec(s"r$i", i.toLong)))
    val got = s.getMany(Seq(3L, 45L, 999L, 3L))
    assert(got == Map(3L -> VRec("r3", 3L), 45L -> VRec("r45", 45L)))
    assert(s.getMany(Nil).isEmpty)
  }

  test("append rejects input that already carries _rowid") {
    val t = VectorTable.create(spark, tmpDir("vtab"))
    import spark.implicits._
    val df = Seq((1L, "x")).toDF(VectorTable.ROWID, "v")
    intercept[IllegalArgumentException](t.append(df))
  }
}
