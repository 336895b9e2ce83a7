package graft.core

import graft.SparkSpec

case class CRec(writer: Int, seq: Long)

/** Concurrent appenders — the reference serializes index reservation under
  * a mutex (dynamic_vector_manage_service.rs:291-298) so parallel writers
  * never interleave a batch or lose rows; our serialized manifest commit
  * must give the same guarantee: total length correct, every batch's rows
  * contiguous in rowid order.
  */
class ConcurrentAppendSpec extends SparkSpec {

  test("parallel pushx: no lost rows, each batch contiguous") {
    import spark.implicits._
    val store = VectorStore.create[CRec](spark, tmpDir("concur"))
    val writers = 6
    val perBatch = 200
    val threads = (0 until writers).map { w =>
      new Thread(() => store.pushx((0 until perBatch).map(i => CRec(w, i.toLong))))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())

    assert(store.len == writers.toLong * perBatch)
    val all = store.table.scan().orderBy("_rowid").collect()
      .map(r => (r.getAs[Int]("writer"), r.getAs[Long]("seq")))
    // each writer's block is contiguous and in input order
    all.grouped(perBatch).foreach { block =>
      val w = block.head._1
      assert(block.forall(_._1 == w), "batches interleaved")
      assert(block.map(_._2).toSeq == (0L until perBatch), "batch order broken")
    }
  }
}
