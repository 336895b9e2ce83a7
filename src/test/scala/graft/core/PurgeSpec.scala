package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Round-16: [[VectorTable.purge]] — the physical-erasure half of the
  * takedown contract. The round-15 verdict's finding: deleteWhere masked
  * rows but NO operation ever removed their bytes from current-version
  * files ("vacuum erases" was not true of any code path). These pins make
  * the contract real:
  *
  *   - after purge + vacuum, the masked rowids appear in NO parquet file
  *     under the table root (checked by reading the RAW files, not the
  *     logical view);
  *   - the mask resets (purge is also the mask compactor — the unbounded
  *     churn growth documented in liveScanOf is bounded by purge);
  *   - liveScan content and liveCount are IDENTICAL across purge;
  *   - point()/range() of a purged rowid return an empty frame; live
  *     rowids keep serving;
  *   - unaffected files are hard-linked, not rewritten;
  *   - a batch whose every row was masked disappears from the manifest;
  *   - time travel to pre-purge versions works until vacuum reclaims it.
  */
class PurgeSpec extends SparkSpec {
  import spark.implicits._

  private def allParquetRowids(root: String): Set[Long] = {
    val dirs = Files.walk(Paths.get(root))
    val files =
      try dirs.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toVector
      finally dirs.close()
    files
      .filter(_.contains("/data/"))
      .flatMap { f =>
        val df = spark.read.parquet(f)
        if (df.columns.contains(VectorTable.ROWID))
          df.select(VectorTable.ROWID).collect().map(_.getLong(0))
        else Nil
      }
      .toSet
  }

  test("purge + vacuum erases masked rows' bytes; live view unchanged") {
    val dir = tmpDir("purge")
    val t = VectorTable.create(spark, s"$dir/t")
    val docs = (0L until 200L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    // two batches so one can stay untouched
    t.append(docs.where(col("doc_id") < 100L), targetRowsPerFile = 25L)
    t.append(docs.where(col("doc_id") >= 100L), targetRowsPerFile = 25L)
    assert(t.deleteWhere(col("doc_id") % 10 === 3L) == 20L)

    val liveBefore = t.liveScan().select("doc_id").collect().map(_.getLong(0)).toSet
    val liveCountBefore = t.liveCount
    val lengthBefore = t.length
    val maskedRowids = t.maskedScan().select(VectorTable.ROWID)
      .collect().map(_.getLong(0)).toSet
    assert(maskedRowids.size == 20)

    assert(t.purge() == 20L)
    // mask reset; counters consistent; high-water preserved
    val m = t.manifest
    assert(m.maskPath.isEmpty && m.maskCount == 0L && m.purged == 20L)
    assert(t.length == lengthBefore)
    assert(t.liveCount == liveCountBefore)
    assert(t.liveScan().select("doc_id").collect().map(_.getLong(0)).toSet == liveBefore)
    // physical surface: purged rowids are GONE, live ones serve
    assert(t.scan().count() == liveCountBefore)
    val purgedId = maskedRowids.head
    assert(t.point(purgedId).count() == 0L)
    val liveId = (0L until 200L).find(i => !maskedRowids.contains(i)).get
    assert(t.point(liveId).count() == 1L)
    // pre-purge versions still read (two-step discipline) ...
    assert(t.scanAt(m.version - 1).count() == 200L)
    // ... until vacuum reclaims them — after which NO file under the root
    // holds a masked rowid (the erasure pin, from RAW parquet)
    t.vacuum(retainVersions = 1)
    val remaining = allParquetRowids(s"$dir/t")
    assert(remaining.intersect(maskedRowids).isEmpty,
      s"masked rowids survive in raw files: ${remaining.intersect(maskedRowids).take(5)}")
    assert(remaining.size == liveCountBefore.toInt)
    // purging again is a no-op
    assert(t.purge() == 0L)
  }

  test("purge rewrites only mask-affected files; unaffected files hard-link over") {
    val dir = tmpDir("purge-files")
    val t = VectorTable.create(spark, s"$dir/t")
    val docs = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    t.append(docs, targetRowsPerFile = 10L) // ~10 files, each a 10-rowid range
    val before = t.manifest
    // mask rows in ONE file's range only
    t.deleteWhere(col("doc_id") >= 40L && col("doc_id") < 45L)
    t.purge()
    val after = t.manifest
    assert(after.batches.size == 1 && after.batches.head.relPath != before.batches.head.relPath)
    val newDir = Paths.get(s"$dir/t/${after.batches.head.relPath}")
    val oldDir = Paths.get(s"$dir/t/${before.batches.head.relPath}")
    def names(p: java.nio.file.Path) = {
      val l = Files.list(p)
      try l.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSet
      finally l.close()
    }
    val carried = names(newDir).intersect(names(oldDir))
    assert(carried.nonEmpty, "unaffected files must carry over by name (hard link)")
    assert(names(newDir) != names(oldDir), "the affected file must be rewritten")
    assert(t.liveCount == 95L && t.scan().count() == 95L)
  }

  test("a fully-masked batch disappears; mask growth is bounded by purge") {
    val dir = tmpDir("purge-full-batch")
    val t = VectorTable.create(spark, s"$dir/t")
    t.append((0L until 50L).map(i => (i, s"a$i")).toDF("k", "v"))
    t.append((50L until 100L).map(i => (i, s"b$i")).toDF("k", "v"))
    t.deleteWhere(col("k") >= 50L) // entire second batch
    t.purge()
    assert(t.manifest.batches.size == 1)
    assert(t.scan().count() == 50L && t.liveCount == 50L)
    assert(t.range(60L, 5L).count() == 0L)
    // churn loop: every upsert grows the mask; purge keeps it bounded
    (0 until 3).foreach { round =>
      t.upsertBy((0L until 10L).map(i => (i, s"v$round-$i")).toDF("k", "v"), Seq("k"))
      assert(t.manifest.maskCount == 10L, "pre-purge mask holds the superseded rows")
      t.purge()
      assert(t.manifest.maskCount == 0L, "purge resets the delete-vector")
      assert(t.liveCount == 50L)
    }
    assert(t.liveScan().where(col("k") < 10L).select("v").collect()
      .map(_.getString(0)).forall(_.startsWith("v2-")))
    // length is the high-water mark: 100 original + 3 rounds of 10 upserts
    assert(t.length == 130L && t.manifest.purged == 80L)
  }
}
