package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compaction invariants for the incrementally-maintained IVF index:
  * span-by-span refresh fragments cells into one file per touched span
  * (the append-only small-file pathology), compact() collapses the layout
  * to exactly one file per cell, and NOTHING else changes — row count,
  * meta (version, length), and search results are all identical before
  * and after.
  */
class IvfCompactionSpec extends SparkSpec {

  test("compact collapses span fragments to one file per cell; rows, meta and search unchanged") {
    val dir = tmpDir("ivf-compact")
    val emb = graft.core.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding"))
    val maxId = emb.agg(max("vec_id")).head.getLong(0)
    val t = graft.core.VectorTable.create(spark, s"$dir/table")
    val cs = emb.orderBy("vec_id").limit(8).collect().map(_.getSeq[Float](1).toArray)
    var idx = IvfTableIndex.buildWith(t, s"$dir/index", cs)
    (0 until 3).foreach { i =>
      val lo = (maxId + 1) * i / 3
      val hi = (maxId + 1) * (i + 1) / 3
      t.append(emb.where(col("vec_id") >= lo && col("vec_id") < hi))
      idx = idx.refresh(t)
    }

    val frag = idx.filesPerCell()
    assert(frag.values.exists(_ > 1), s"spans must fragment some cell: $frag")
    val q = emb.where(col("vec_id") === 5L).select("embedding")
      .head().getSeq[Float](0).toArray
    val before = idx.search(q, 5, 2).collect().toSeq
    val rowsBefore = idx.data.count()
    val metaBefore = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/index", "meta.txt"))

    idx.compact()

    assert(idx.filesPerCell().values.forall(_ == 1L), "one file per cell after compact")
    assert(idx.data.count() == rowsBefore, "compaction never changes a row")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/index", "meta.txt")) == metaBefore,
      "compaction never touches (version, length)")
    val after = idx.search(q, 5, 2).collect().toSeq
    assert(before == after, "search results bit-identical across compaction")

    // a second compact is a clean no-op on the already-compact layout
    idx.compact()
    assert(idx.filesPerCell().values.forall(_ == 1L))
    assert(idx.data.count() == rowsBefore)
  }
}
