package graft.core

import graft.SparkSpec

case class VacRec(v: Long, s: String)

/** VACUUM: storage reclamation bounded by retention — current reads stay
  * intact, history outside the window is really gone (files AND
  * manifests), and appends continue cleanly afterwards.
  */
class VacuumSpec extends SparkSpec {

  test("vacuum(1) after compaction drops old batch dirs, keeps the live view") {
    import spark.implicits._
    val s = VectorStore.create[VacRec](spark, tmpDir("vac"))
    (0 until 3).foreach(b => s.pushx((0 until 100).map(i => VacRec(b * 100L + i, s"x$i"))))
    s.table.compact()
    val dataDir = java.nio.file.Paths.get(s.table.root, "data")
    def nDirs = java.nio.file.Files.list(dataDir).count()
    assert(nDirs == 4, s"3 batches + compacted, got $nDirs")

    s.table.vacuum(1)
    assert(nDirs == 1, "only the compacted batch dir survives")
    assert(s.len == 300L)
    assert(s.getall().get.map(_.v) == (0L until 300L))
    assert(s.table.versions == Seq(s.table.manifest.version), "old manifests gone")
    // time travel outside retention is gone
    intercept[Exception](s.table.scanAt(1L).count())
  }

  test("vacuum with retention keeps every batch a retained version references") {
    import spark.implicits._
    val s = VectorStore.create[VacRec](spark, tmpDir("vac2"))
    (0 until 3).foreach(b => s.pushx((0 until 50).map(i => VacRec(b * 50L + i, "y"))))
    val versions = s.table.versions
    s.table.vacuum(2)
    // last two manifests reference batches 1+2 and 1+2+3 → all three dirs stay
    val dataDir = java.nio.file.Paths.get(s.table.root, "data")
    assert(java.nio.file.Files.list(dataDir).count() == 3)
    assert(s.table.versions == versions.takeRight(2))
    // the older retained version is still time-travel readable
    assert(s.table.scanAt(s.table.versions.head).count() == 100L)
    // and appends continue cleanly after a vacuum
    s.pushx(Seq(VacRec(999L, "z")))
    assert(s.len == 151L)
  }

  test("vacuum reclaims an orphaned mask dir (crashed upsert) but keeps the live one") {
    import spark.implicits._
    val s = VectorStore.create[VacRec](spark, tmpDir("vac4"))
    s.pushx((0 until 10).map(i => VacRec(i.toLong, "a")))
    s.table.upsertBy(Seq(VacRec(3L, "a2")).toDF(), Seq("v"))
    val liveMask = s.table.manifest.maskPath
    assert(liveMask.nonEmpty)
    // simulate a crashed upsert: a mask dir no manifest references
    val orphan = java.nio.file.Paths.get(s.table.root, "data", "mask-99999999-deadbeef")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.writeString(orphan.resolve("part-orphan.parquet"), "x")
    s.table.vacuum(1)
    assert(!java.nio.file.Files.exists(orphan), "orphaned mask must be reclaimed")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s.table.root, liveMask)), "live mask must survive")
    assert(s.table.liveCount == 10L)
    assert(s.table.liveScan().where(org.apache.spark.sql.functions.col("v") === 3L)
      .head().getAs[String]("s") == "a2")
  }

  test("vacuum is a no-op when everything is within retention") {
    import spark.implicits._
    val s = VectorStore.create[VacRec](spark, tmpDir("vac3"))
    s.pushx((0 until 10).map(i => VacRec(i.toLong, "a")))
    val before = s.table.versions
    s.table.vacuum(5)
    assert(s.table.versions == before && s.len == 10L)
  }
}
