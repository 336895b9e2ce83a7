package graft.sources

import graft.SparkSpec
import graft.core.VectorTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Format ingestion: CSV/JSONL → VectorTable with dense rowids → export. */
class IngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("csv roundtrip into VectorTable with dense rowids") {
    val dir = tmpDir("csv-in")
    Files.writeString(Paths.get(dir, "part1.csv"),
      "id,name,score\n1,alpha,1.5\n2,beta,2.5\n3,gamma,3.5\n")
    val df = Ingest.csv(spark, dir, schema)
    val table = VectorTable.create(spark, tmpDir("csv-table"))
    Ingest.intoTable(df.orderBy("id"), table)
    assert(table.length == 3L)
    val rows = table.scan().orderBy("_rowid").collect()
    assert(rows.map(_.getAs[Long]("_rowid")).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_.getAs[String]("name")).toSeq == Seq("alpha", "beta", "gamma"))
  }

  test("jsonl ingest honors explicit schema incl. missing fields as null") {
    val dir = tmpDir("json-in")
    Files.writeString(Paths.get(dir, "a.json"),
      """{"id": 1, "name": "x", "score": 0.5}
        |{"id": 2, "name": "y"}
        |""".stripMargin)
    val df = Ingest.jsonl(spark, dir, schema)
    assert(df.count() == 2)
    assert(df.where(col("score").isNull).count() == 1)
  }

  test("export drops the internal rowid and roundtrips through parquet") {
    import spark.implicits._
    val table = VectorTable.create(spark, tmpDir("exp-table"))
    table.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val out = tmpDir("exp-out")
    Ingest.export(table, out)
    val back = spark.read.parquet(out)
    assert(back.columns.toSet == Set("id", "v"))
    assert(back.count() == 2)
  }

  test("orc roundtrip: export to ORC, ingest back into a VectorTable") {
    import spark.implicits._
    val table = VectorTable.create(spark, tmpDir("orc-table"))
    table.append((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    val out = tmpDir("orc-out")
    Ingest.export(table, out, format = "orc")
    val back = Ingest.orc(spark, out)
    assert(back.count() == 100)
    val table2 = VectorTable.create(spark, tmpDir("orc-table2"))
    Ingest.intoTable(back, table2)
    assert(table2.length == 100L)
    assert(table2.scan().agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0) == 5050L)
  }
}
