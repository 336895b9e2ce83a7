package graft.streaming

import graft.SparkSpec
import graft.core.{VectorStore, VectorTable}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

case class FRec(id: Long, name: String)

/** End-to-end file-source streaming: parquet files dropped into a watched
  * directory flow through readStream → StreamIngest → VectorTable with
  * dense rowids — the production ingest topology (the MemoryStream specs
  * cover semantics; this covers the real source wiring).
  */
@graft.SlowTest
class FileStreamIngestSpec extends SparkSpec {

  test("readStream over a directory lands files in the table as they arrive") {
    import spark.implicits._
    val inDir = tmpDir("fs-in")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))

    // first file present before the stream starts
    Seq(FRec(0L, "a"), FRec(1L, "b")).toDF()
      .coalesce(1).write.mode("append").parquet(inDir)

    val root = tmpDir("fs-table")
    val table = VectorTable.create(spark, root)
    val stream = spark.readStream.schema(schema).parquet(inDir)
    val q = StreamIngest.start(stream, table, tmpDir("fs-ckpt"))
    q.processAllAvailable()
    assert(table.length == 2L)

    // second file arrives while the stream runs
    Seq(FRec(2L, "c"), FRec(3L, "d"), FRec(4L, "e")).toDF()
      .coalesce(1).write.mode("append").parquet(inDir)
    q.processAllAvailable()
    q.stop()

    assert(table.length == 5L)
    val store = VectorStore.open[FRec](spark, root)
    assert(store.getall().get.map(_.id).sorted == (0L until 5L))
    // rowids dense regardless of file arrival order
    assert(table.scan().select("_rowid").collect().map(_.getLong(0)).sorted.toSeq == (0L until 5L))
  }

  test("a widened stream (added nullable column) evolves the table mid-ingest") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = tmpDir("fs-evolve")
    val table = VectorTable.create(spark, root)
    // batch 1 through the original schema
    table.append(Seq(FRec(0L, "a"), FRec(1L, "b")).toDF())
    // the stream restarts with a widened (nullable) schema — the append-side
    // evolution policy admits it and reads merge schemas
    table.append(Seq((2L, "c", Some(0.5)), (3L, "d", None))
      .toDF("id", "name", "score"))
    val m = table.manifest
    assert(m.mixedSchema && table.length == 4L)
    val scan = table.scan()
    assert(scan.where(col("score").isNull).count() == 3) // 2 old + 1 new null
    // and a non-nullable widening is still rejected at the streaming append
    intercept[IllegalArgumentException] {
      table.append(Seq((4L, "e")).toDF("id", "name").withColumn("strict", lit(1L)))
    }
  }
}
