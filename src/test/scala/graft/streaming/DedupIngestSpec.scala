package graft.streaming

import graft.SparkSpec
import graft.core.{VectorStore, VectorTable}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class DRec(id: Long, body: String)

/** Dedup-at-ingest: duplicates within a batch, across batches, and against
  * committed history all land exactly once; bloom false positives are
  * resolved by the exact anti-join (never dropping a novel row).
  */
@graft.SlowTest
class DedupIngestSpec extends SparkSpec {

  test("batch API: in-batch, cross-batch, and historical dups are dropped") {
    import spark.implicits._
    val table = VectorTable.create(spark, tmpDir("dedup-ingest"))
    val b1 = Seq(DRec(1, "alpha"), DRec(2, "beta"), DRec(3, "alpha")).toDF() // in-batch dup
    val (n1, d1) = DedupIngest.appendDeduped(table, b1, Seq("body"))
    assert(n1 == 2 && d1 == 1)

    val b2 = Seq(DRec(4, "beta"), DRec(5, "gamma")).toDF() // historical dup
    val (n2, d2) = DedupIngest.appendDeduped(table, b2, Seq("body"))
    assert(n2 == 1 && d2 == 1)

    assert(table.length == 3L)
    val bodies = table.scan().select("body").collect().map(_.getString(0)).sorted.toSeq
    assert(bodies == Seq("alpha", "beta", "gamma"))
  }

  test("streaming form dedups each micro-batch against history") {
    import spark.implicits._
    val input = MemoryStream[DRec](spark)
    val table = VectorTable.create(spark, tmpDir("dedup-stream"))
    val q = DedupIngest.start(input.toDF(), table, Seq("body"), tmpDir("dedup-ckpt"))

    input.addData(DRec(1, "x"), DRec(2, "y"))
    q.processAllAvailable()
    input.addData(DRec(3, "x"), DRec(4, "z")) // "x" already committed
    q.processAllAvailable()
    q.stop()

    assert(table.length == 3L)
  }

  test("no novel rows are ever lost (bloom positives go through exact check)") {
    import spark.implicits._
    val table = VectorTable.create(spark, tmpDir("dedup-fpp"))
    // tiny expectedItems + high fpp to force many bloom positives
    val first = (0 until 200).map(i => DRec(i.toLong, s"doc-$i")).toDF()
    DedupIngest.appendDeduped(table, first, Seq("body"), expectedItems = 10, fpp = 0.5)
    val second = (200 until 400).map(i => DRec(i.toLong, s"doc-$i")).toDF()
    val (n, d) = DedupIngest.appendDeduped(table, second, Seq("body"), expectedItems = 10, fpp = 0.5)
    assert(n == 200 && d == 0) // every truly-novel row survived
    assert(table.length == 400L)
  }
}
