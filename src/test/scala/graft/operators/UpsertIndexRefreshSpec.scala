package graft.operators

import graft.SparkSpec
import graft.core.VectorTable
import org.apache.spark.sql.functions._

/** Round-16 ADVICE: upsert + index refresh must keep the LIVE replacement
  * row indexed. The delete-vector mask holds every row ever superseded —
  * including rows `upsertBy` replaced, which share their key (doc_id /
  * vec_id) with a live replacement. Takedown propagation therefore
  * anti-joins the index on `_rowid` (the physical address, unique per row
  * forever), never the key: a key anti-join would also delete the
  * replacement's just-written index entries.
  *
  * Also covers the two adjacent round-16 ADVICE items:
  *   - an IVF index whose every row is taken down serves as a healthy
  *     EMPTY index (the loud-fail gate keys on live count, not physical
  *     indexed length);
  *   - `IndexCompaction.compact` is a no-op on a hive-partitioned layout
  *     already at one file per partition (previously it rewrote the whole
  *     index on every call).
  */
class UpsertIndexRefreshSpec extends SparkSpec {
  import spark.implicits._

  private def docsFixture(n: Int) =
    (0L until n.toLong).map(i => (i, s"document number $i with some shared words " +
      s"alpha beta gamma delta token$i content body")).toDF("doc_id", "text")

  test("LshIndex: upsertBy + refresh keeps the live replacement's band rows") {
    val dir = tmpDir("upsert-lsh")
    val t = VectorTable.create(spark, s"$dir/t")
    t.append(docsFixture(40))
    var idx = LshIndex.build(t, s"$dir/index")
    // replace doc 7 with new content; the replacement lands at a fresh rowid
    t.upsertBy(Seq((7L, "completely rewritten body with different words " +
      "epsilon zeta eta theta replacement text")).toDF("doc_id", "text"),
      Seq("doc_id"))
    idx = idx.refresh(t)
    // the live replacement must still be indexed...
    assert(idx.bands.where(col("doc_id") === 7L).count() > 0,
      "upsert replacement's band rows were deleted by the refresh")
    // ...and exactly once: its band rows carry the replacement's rowid only
    val rowids = idx.bands.where(col("doc_id") === 7L)
      .select(VectorTable.ROWID).distinct().collect().map(_.getLong(0)).toSet
    val liveRowid = t.liveScan().where(col("doc_id") === 7L)
      .select(VectorTable.ROWID).head().getLong(0)
    assert(rowids == Set(liveRowid),
      s"expected only the live rowid $liveRowid indexed for doc 7, got $rowids")
    // a takedown of a DIFFERENT doc still propagates precisely
    t.deleteWhere(col("doc_id") === 3L)
    idx = idx.refresh(t)
    assert(idx.bands.where(col("doc_id") === 3L).count() == 0)
    assert(idx.bands.where(col("doc_id") === 7L).count() > 0)
  }

  test("IvfTableIndex: upsertBy + refresh keeps the live replacement indexed") {
    val dir = tmpDir("upsert-ivf")
    val emb = graft.core.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding")).limit(64)
    val cs = emb.orderBy("vec_id").limit(4).collect().map(_.getSeq[Float](1).toArray)
    val t = VectorTable.create(spark, s"$dir/t")
    t.append(emb)
    var idx = IvfTableIndex.buildWith(t, s"$dir/index", cs)
    val vid = emb.orderBy("vec_id").limit(1).head().getLong(0)
    // replace the vector with a perturbed copy (same vec_id, fresh rowid);
    // derived from the source frame so the array nullability matches
    t.upsertBy(emb.where(col("vec_id") === vid)
      .withColumn("embedding", expr("transform(embedding, x -> CAST(x * 0.5 AS FLOAT))")),
      Seq("vec_id"))
    idx = idx.refresh(t)
    assert(idx.data.where(col("vec_id") === vid).count() == 1L,
      "upsert replacement must stay indexed exactly once")
    assert(idx.data.count() == t.liveCount)
  }

  test("IvfTableIndex: deleting every indexed row leaves a healthy EMPTY index") {
    val dir = tmpDir("ivf-all-deleted")
    val emb = graft.core.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding")).limit(32)
    val cs = emb.orderBy("vec_id").limit(4).collect().map(_.getSeq[Float](1).toArray)
    val t = VectorTable.create(spark, s"$dir/t")
    t.append(emb)
    var idx = IvfTableIndex.buildWith(t, s"$dir/index", cs)
    assert(t.deleteWhere(lit(true)) == 32L)
    idx = idx.refresh(t)
    // pre-fix this threw "index data lost" on a legitimately-empty index
    assert(idx.data.count() == 0L)
    val q = cs(0)
    assert(idx.search(q, 5, 2).count() == 0L)
  }

  test("IndexCompaction: partitioned layout at one file per cell is a compact no-op") {
    val dir = tmpDir("ivf-compact-noop")
    val emb = graft.core.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding")).limit(64)
    val cs = emb.orderBy("vec_id").limit(4).collect().map(_.getSeq[Float](1).toArray)
    val t = VectorTable.create(spark, s"$dir/t")
    t.append(emb)
    val idx = IvfTableIndex.buildWith(t, s"$dir/index", cs)
    // build writes one file per cell already (repartition(cell) + partitionBy)
    assert(idx.filesPerCell().values.forall(_ == 1L))
    assert(!IndexCompaction.compact(spark, idx.root, partitionCols = Seq("cell"),
      sortWithin = Seq("vec_id")),
      "compact over an already-one-file-per-cell layout must be a no-op")
    // fragment it with a second span; compaction then runs and collapses it
    t.append(graft.core.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id").desc).limit(64))
    val idx2 = idx.refresh(t)
    assert(idx2.filesPerCell().values.exists(_ > 1L))
    assert(IndexCompaction.compact(spark, idx2.root, partitionCols = Seq("cell"),
      sortWithin = Seq("vec_id")))
    assert(idx2.filesPerCell().values.forall(_ == 1L))
  }
}
