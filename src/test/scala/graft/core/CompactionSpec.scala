package graft.core

import graft.SparkSpec

case class KRec(v: Long)

/** Compaction: many small batches → one rowid-clustered batch; data,
  * order, and pruning behavior preserved; concurrent-writer conflicts
  * surface clearly.
  */
class CompactionSpec extends SparkSpec {

  test("compact merges batches, preserves rowids and order") {
    import spark.implicits._
    val s = VectorStore.create[KRec](spark, tmpDir("compact"))
    (0 until 8).foreach { b =>
      s.pushx((0 until 100).map(i => KRec(b * 100L + i)))
    }
    assert(s.table.manifest.batches.size == 8)
    s.table.compact()
    val m = s.table.manifest
    assert(m.batches.size == 1)
    assert(m.length == 800L)
    assert(s.getall().get.map(_.v) == (0L until 800L))
    assert(s.pullx(350, 20).map(_.v) == (350L until 370L))
  }

  test("append after compaction continues the dense sequence") {
    import spark.implicits._
    val s = VectorStore.create[KRec](spark, tmpDir("compact2"))
    (0 until 3).foreach(b => s.pushx((0 until 10).map(i => KRec(b * 10L + i))))
    s.table.compact()
    s.pushx((30 until 40).map(i => KRec(i.toLong)))
    assert(s.len == 40L)
    assert(s.getall().get.map(_.v) == (0L until 40L))
  }

  test("micro-batch appends produce one file each (size targeting)") {
    import spark.implicits._
    val s = VectorStore.create[KRec](spark, tmpDir("sized"))
    s.pushx((0 until 100).map(i => KRec(i.toLong)))
    val files = s.table.scan().inputFiles
    assert(files.length == 1, s"expected 1 file for a 100-row batch, got ${files.length}")
  }

  test("out-of-band manifest commits are picked up; true version races collide") {
    import spark.implicits._
    val s = VectorStore.create[KRec](spark, tmpDir("conflict"))
    s.pushx(Seq(KRec(0L)))
    // another writer commits the next version out-of-band: append re-reads
    // the manifest inside the lock and continues from the new state
    val m = s.table.manifest
    Manifest.commit(s.table.root, m.copy(version = m.version + 1, length = 5L))
    s.pushx(Seq(KRec(1L)))
    assert(s.table.manifest.version == m.version + 2)
    assert(s.len == 6L) // continued after the other writer's claimed length
    // a genuine race (two writers committing the same version) collides
    // atomically at the create-if-absent
    intercept[java.nio.file.FileAlreadyExistsException](
      Manifest.commit(s.table.root, s.table.manifest.copy()))
  }
}
