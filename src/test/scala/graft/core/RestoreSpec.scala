package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RESTORE semantics: rollback is a new commit (history preserved), the
  * head equals the restored version's full state (length, rows, upsert
  * mask, stream batch id), and the insert-only view algebra refuses a
  * rewound basis instead of over-counting.
  */
class RestoreSpec extends SparkSpec {

  test("restore rewinds head state but keeps history readable") {
    import spark.implicits._
    val t = VectorTable.create(spark, tmpDir("restore"))
    t.append(Seq(1L, 2L, 3L).toDF("v"))
    t.append(Seq(4L, 5L).toDF("v"))
    t.append(Seq(6L).toDF("v"))
    assert(t.length == 6L && t.versions == Seq(1L, 2L, 3L))
    t.restore(2L)
    // head = state at v2; the restore itself is v4
    assert(t.versions == Seq(1L, 2L, 3L, 4L))
    assert(t.length == 5L)
    assert(t.scan().agg(max(col("v"))).head.getLong(0) == 5L)
    // pre-restore head still time-travels
    assert(t.scanAt(3L).count() == 6L)
    // appends continue from the restored high-water mark
    t.append(Seq(7L).toDF("v"))
    assert(t.length == 6L)
    assert(t.scan().agg(max(col("v"))).head.getLong(0) == 7L)
  }

  test("restore rewinds the upsert mask with the version") {
    import spark.implicits._
    val t = VectorTable.create(spark, tmpDir("restore-up"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    val vPre = t.versions.max
    t.upsertBy(Seq((1L, "a2")).toDF("k", "s"), Seq("k"))
    assert(t.liveScan().where(col("s") === "a2").count() == 1L)
    t.restore(vPre)
    assert(t.liveCount == 2L)
    assert(t.liveScan().where(col("s") === "a").count() == 1L)
    assert(t.liveScan().where(col("s") === "a2").count() == 0L)
  }

  test("view refresh refuses a basis newer than the restored head") {
    import spark.implicits._
    val root = tmpDir("restore-mv")
    val t = VectorTable.create(spark, s"$root/t")
    t.append(Seq(("a", 1.0)).toDF("k", "v"))
    t.append(Seq(("b", 2.0)).toDF("k", "v"))
    val v = MaterializedAggView.build(t, s"$root/view", Seq("k"), Seq("v"))
    t.restore(1L)
    intercept[IllegalArgumentException] { v.refresh() }
  }
}
