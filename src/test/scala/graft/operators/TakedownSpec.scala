package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Takedown / right-to-be-forgotten delete (round 15): the logical delete
  * over [[graft.core.VectorTable]] and its propagation into the
  * incrementally-maintained IVF index.
  *
  *   - deleteWhere masks live rows, bumps (version, maskCount), leaves the
  *     physical rowid surface and earlier versions readable;
  *   - refresh() sees the mask delta and rewrites ONLY the affected cells
  *     (unaffected cells' parquet files are hard-linked — same file names,
  *     no data copied);
  *   - post-refresh search results equal a from-scratch index built over
  *     only the live rows (parity — no stale index rows serve deleted
  *     docs);
  *   - delete composes with append: a later span refresh keeps the
  *     deletes applied, and deleting freshly-appended rows works;
  *   - idempotence: a second refresh after the delete is a no-op.
  */
class TakedownSpec extends SparkSpec {
  import spark.implicits._

  test("deleteWhere masks live rows and versions the commit") {
    val dir = tmpDir("takedown-table")
    val t = graft.core.VectorTable.create(spark, s"$dir/t")
    val emb = graft.core.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding")).limit(100)
    t.append(emb)
    val v0 = t.manifest.version
    val n = t.deleteWhere(col("vec_id") % 10 === 0)
    assert(n == 10L)
    assert(t.manifest.version == v0 + 1 && t.manifest.maskCount == 10L)
    assert(t.liveCount == 90L)
    assert(t.liveScan().where(col("vec_id") % 10 === 0).count() == 0)
    // the physical surface is untouched (legal erasure is vacuum's job)
    assert(t.scan().count() == 100L)
    assert(t.maskedScan().count() == 10L)
    // deleting the same rows again commits nothing
    assert(t.deleteWhere(col("vec_id") % 10 === 0) == 0L)
    assert(t.manifest.version == v0 + 1)
  }

  test("delete -> refresh rewrites only affected cells; search parity with a live-only rebuild") {
    val dir = tmpDir("takedown-ivf")
    val emb = graft.core.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding"))
    val cs = emb.orderBy("vec_id").limit(8).collect().map(_.getSeq[Float](1).toArray)
    val t = graft.core.VectorTable.create(spark, s"$dir/t")
    t.append(emb)
    var idx = IvfTableIndex.buildWith(t, s"$dir/index", cs)

    // choose victims concentrated in ONE cell so most cells are unaffected
    val victimCell = idx.data.groupBy("cell").count()
      .orderBy(col("count").desc).head().getInt(0)
    val victims = idx.data.where(col("cell") === victimCell)
      .select("vec_id").orderBy("vec_id").limit(5)
      .collect().map(_.getLong(0))
    val untouchedFiles = filesByCell(idx).filter(_._1 != victimCell)

    assert(t.deleteWhere(col("vec_id").isin(victims: _*)) == victims.length.toLong)
    idx = idx.refresh(t)
    assert(idx.indexedMask == victims.length.toLong)

    // deleted ids are gone from the index; every other row survives
    assert(idx.data.where(col("vec_id").isin(victims: _*)).count() == 0)
    assert(idx.data.count() == t.liveCount)
    // unaffected cells kept their exact files (hard-linked, not rewritten)
    val after = filesByCell(idx)
    untouchedFiles.foreach { case (cell, files) =>
      assert(after(cell) == files, s"cell $cell must keep its files verbatim")
    }

    // search parity: post-delete index ≡ from-scratch index over live rows
    val t2 = graft.core.VectorTable.create(spark, s"$dir/t2")
    t2.append(t.liveScan().select("vec_id", "embedding"))
    val fresh = IvfTableIndex.buildWith(t2, s"$dir/index2", cs)
    val q = emb.where(col("vec_id") === 5L).select("embedding")
      .head().getSeq[Float](0).toArray
    assert(idx.search(q, 5, 3).collect().toSeq ==
      fresh.search(q, 5, 3).collect().toSeq,
      "no stale index row may serve a deleted doc")

    // a second refresh is a no-op
    assert(idx.refresh(t) eq idx)
  }

  test("delete composes with append: later spans land, deletes stay applied") {
    val dir = tmpDir("takedown-append")
    val emb = graft.core.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding"))
    val maxId = emb.agg(max("vec_id")).head.getLong(0)
    val cs = emb.orderBy("vec_id").limit(4).collect().map(_.getSeq[Float](1).toArray)
    val t = graft.core.VectorTable.create(spark, s"$dir/t")
    t.append(emb.where(col("vec_id") <= maxId / 2))
    var idx = IvfTableIndex.buildWith(t, s"$dir/index", cs)
    t.deleteWhere(col("vec_id") % 7 === 0)
    // append the second half, then refresh once: the span lands AND the
    // deletes apply in the same maintenance pass
    t.append(emb.where(col("vec_id") > maxId / 2))
    idx = idx.refresh(t)
    assert(idx.data.count() == t.liveCount)
    assert(idx.data.where(col("vec_id") % 7 === 0 && col("vec_id") <= maxId / 2).count() == 0)
    assert(idx.data.where(col("vec_id") > maxId / 2).count() ==
      t.liveScan().where(col("vec_id") > maxId / 2).count())
    // delete rows from the fresh span too
    t.deleteWhere(col("vec_id") === maxId)
    idx = idx.refresh(t)
    assert(idx.data.where(col("vec_id") === maxId).count() == 0)
    assert(idx.data.count() == t.liveCount)
  }

  test("delta indexes: delete -> refresh rewrites only affected files; parity with a live-only rebuild") {
    val dir = tmpDir("takedown-lsh")
    val docs = graft.core.Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"))
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val t = graft.core.VectorTable.create(spark, s"$dir/t")
    t.append(docs.where(col("doc_id") <= maxId / 2))
    var idx = LshIndex.build(t, s"$dir/index")
    t.append(docs.where(col("doc_id") > maxId / 2))
    idx = idx.refresh(t)
    // victims live in the FIRST span only, so the second span's file is
    // unaffected and must be hard-linked verbatim
    val victims = idx.bands.where(col("doc_id") <= maxId / 4)
      .select("doc_id").distinct().orderBy("doc_id").limit(5)
      .collect().map(_.getLong(0))
    val filesBefore = liveFiles(idx.root)
    assert(t.deleteWhere(col("doc_id").isin(victims: _*)) == victims.length.toLong)
    idx = idx.refresh(t)
    assert(idx.indexedMask == victims.length.toLong)
    assert(idx.bands.where(col("doc_id").isin(victims: _*)).count() == 0,
      "no deleted doc's band rows may survive")
    // parity: post-delete index rows == a from-scratch build over live docs
    val t2 = graft.core.VectorTable.create(spark, s"$dir/t2")
    t2.append(t.liveScan().select("doc_id", "text"))
    val fresh = LshIndex.build(t2, s"$dir/index2")
    // parity over LOGICAL band rows — the rebuilt table assigns fresh
    // rowids, so the physical-address column is excluded by design
    val logicalCols = Seq("doc_id", "band", "h1", "h2")
    val idxBands = idx.bands.select(logicalCols.map(col): _*)
    val freshBands = fresh.bands.select(logicalCols.map(col): _*)
    assert(idxBands.exceptAll(freshBands).count() == 0 &&
      freshBands.exceptAll(idxBands).count() == 0,
      "band-row set parity with a live-only rebuild")
    // at least one original file (the span without victims) is kept
    val filesAfter = liveFiles(idx.root)
    assert(filesBefore.intersect(filesAfter).nonEmpty,
      "unaffected files must be carried over (hard-linked), not rewritten")
    assert(idx.refresh(t) eq idx, "second refresh is a no-op")
    // and the same contract holds for a SpanIndex over the same history
    val t3 = graft.core.VectorTable.create(spark, s"$dir/t3")
    t3.append(docs)
    var sidx = SpanIndex.build(t3, s"$dir/spanindex")
    t3.deleteWhere(col("doc_id").isin(victims: _*))
    sidx = sidx.refresh(t3)
    assert(sidx.windows.where(col("doc_id").isin(victims: _*)).count() == 0)
    assert(sidx.indexedMask == victims.length.toLong)
  }

  test("secondary + composite key indexes consume takedown masks (round 16)") {
    val dir = tmpDir("takedown-keyidx")
    val docs = graft.core.Tables.documents(spark, sf())
      .select(col("doc_id"), col("source"), col("text"))
    val t = graft.core.VectorTable.create(spark, s"$dir/t")
    t.append(docs)
    var sec = graft.core.SecondaryIndex.build(t, "doc_id", s"$dir/sec")
    var multi = graft.core.MultiIndex.build(t, Seq("source", "doc_id"), s"$dir/multi")
    val victims = docs.orderBy("doc_id").limit(4)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(t.deleteWhere(col("doc_id").isin(victims.map(_._1): _*)) == 4L)
    sec = sec.refresh(t)
    multi = multi.refresh(t)
    victims.foreach { case (id, src) =>
      assert(sec.lookup(id).isEmpty, s"secondary index still serves deleted $id")
      assert(multi.lookup(Seq(src, id)).isEmpty,
        s"composite index still serves deleted ($src, $id)")
    }
    // a live doc keeps serving, and a fresh append refreshes normally
    val liveId = docs.orderBy(col("doc_id").desc).limit(1).head().getLong(0)
    assert(sec.lookup(liveId).nonEmpty)
    import spark.implicits._
    t.append(Seq((9999999L, "zz", "late arrival")).toDF("doc_id", "source", "text"))
    sec = sec.refresh(t); multi = multi.refresh(t)
    assert(sec.lookup(9999999L).nonEmpty && multi.lookup(Seq("zz", 9999999L)).nonEmpty)
    // a rebuild over the deleted table never contains the victims
    val sec2 = graft.core.SecondaryIndex.build(t, "doc_id", s"$dir/sec2")
    victims.foreach { case (id, _) => assert(sec2.lookup(id).isEmpty) }
    // refresh after the rebuild is a no-op (mask already excluded)
    assert(sec2.refresh(t) eq sec2)
  }

  private def liveFiles(root: String): Set[String] = {
    val d = IndexCompaction.dataDir(root)
    val walk = java.nio.file.Files.walk(d)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map(_.getFileName.toString).toSet
    } finally walk.close()
  }

  private def filesByCell(idx: IvfTableIndex): Map[Int, Set[String]] = {
    val d = IndexCompaction.dataDir(idx.root)
    val walk = java.nio.file.Files.walk(d)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .toSeq
        .groupBy(p => p.getParent.getFileName.toString.stripPrefix("cell=").toInt)
        .map { case (c, fs) => c -> fs.map(_.getFileName.toString).toSet }
    } finally walk.close()
  }
}
