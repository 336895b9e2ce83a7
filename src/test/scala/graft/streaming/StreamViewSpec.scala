package graft.streaming

import graft.SparkSpec
import graft.core.{MaterializedAggView, VectorTable}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class SVRec(k: String, v: Double)

/** Streaming IVM: a MaterializedAggView maintained inside the ingest loop
  * tracks the table batch-for-batch and always equals a from-scratch
  * rebuild — the continuously-fresh-rollup pattern (ingest and the
  * maintained aggregate advance together, no full rescan per batch).
  */
@graft.SlowTest
class StreamViewSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("view maintained by the ingest loop equals a rebuild after each wave") {
    import spark.implicits._
    val root = tmpDir("streammv")
    val table = VectorTable.create(spark, s"$root/t")
    // seed so the view has a non-empty basis before the stream starts
    table.append(Seq(SVRec("a", 1.0), SVRec("b", 2.0)).toDF())
    val view = MaterializedAggView.build(table, s"$root/view", Seq("k"), Seq("v"))

    val input = MemoryStream[SVRec](spark)
    val q = StreamIngest.start(input.toDF(), table, tmpDir("ckpt-mv"),
      maintainViews = Seq(view))
    try {
      input.addData(SVRec("a", 3.0), SVRec("c", 4.0))
      q.processAllAvailable()
      assert(view.basisVersion == table.versions.max)
      assert(canon(view.read()) ==
        canon(MaterializedAggView.build(table, s"$root/v2", Seq("k"), Seq("v")).read()))

      input.addData(SVRec("b", -1.0), SVRec("c", 0.5), SVRec("d", 9.0))
      q.processAllAvailable()
      assert(view.basisVersion == table.versions.max)
      assert(canon(view.read()) ==
        canon(MaterializedAggView.build(table, s"$root/v3", Seq("k"), Seq("v")).read()))
      assert(view.read().where(col("k") === "c").head.getLong(1) == 2L)
    } finally q.stop()
  }
}
