package graft.operators

import graft.SparkSpec
import graft.core.VectorTable
import org.apache.spark.sql.functions._

/** Round-17 (round-16 ADVICE, medium): the legacy-layout probe must run
  * BEFORE a refresh appends its span. Probing after the append sees the
  * just-written `_rowid`-carrying files, chooses rowid addressing, and the
  * pre-round-16 files — whose rows then read `_rowid` as NULL under the
  * mixed schema — dodge the delete anti-join: takedowns silently leave
  * legacy index rows serving deleted docs. The fix keeps a legacy layout
  * LEGACY: spans appended into it drop `_rowid`, addressing stays by
  * business key, and the layout never mixes schemas.
  */
class LegacyLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def docRows(ids: Range) =
    ids.map(i => (i.toLong, s"alpha$i bravo$i charlie$i delta$i echo$i")).toDF("doc_id", "text")

  /** Rewrite the index's live layout WITHOUT `_rowid` — a faithful
    * pre-round-16 on-disk state (same rows, same metadata, legacy schema).
    */
  private def stripRowid(root: String): Unit = {
    val live = IndexCompaction.dataDir(root)
    val legacy = s"$root/data-legacy"
    spark.read.parquet(live.toString).drop(VectorTable.ROWID)
      .coalesce(1).write.parquet(legacy)
    IndexCompaction.publish(root, "data-legacy")
  }

  test("LshIndex over a legacy layout: span append keeps legacy schema, takedown still lands") {
    val dir = tmpDir("legacy-lsh")
    val t = VectorTable.create(spark, s"$dir/t")
    t.append(docRows(0 until 40))
    LshIndex.build(t, s"$dir/lsh")
    stripRowid(s"$dir/lsh")
    var idx = LshIndex.open(spark, s"$dir/lsh")
    // grow the table, then delete victims from the LEGACY span in the
    // same refresh — the old order (append, then probe) would mix schemas
    // and miss them
    t.append(docRows(40 until 60))
    assert(t.deleteWhere(col("doc_id") < 3) == 3L)
    idx = idx.refresh(t)
    val live = IndexCompaction.dataDir(s"$dir/lsh").toString
    assert(!spark.read.parquet(live).columns.contains(VectorTable.ROWID),
      "a legacy layout must stay legacy — no mixed schema")
    assert(idx.bands.where(col("doc_id") < 3).count() == 0L,
      "legacy rows must not dodge the takedown anti-join")
    assert(idx.bands.where(col("doc_id") >= 40).select("doc_id").distinct().count() == 20L,
      "the appended span must be indexed")
    assert(idx.refresh(t) eq idx)
  }

  test("SimHashIndex over a legacy layout: same contract") {
    val dir = tmpDir("legacy-sim")
    val t = VectorTable.create(spark, s"$dir/t")
    t.append(docRows(0 until 30))
    SimHashIndex.build(t, s"$dir/sim")
    stripRowid(s"$dir/sim")
    var idx = SimHashIndex.open(spark, s"$dir/sim")
    t.append(docRows(30 until 45))
    assert(t.deleteWhere(col("doc_id") === 1L || col("doc_id") === 31L) == 2L)
    idx = idx.refresh(t)
    val live = IndexCompaction.dataDir(s"$dir/sim").toString
    assert(!spark.read.parquet(live).columns.contains(VectorTable.ROWID))
    assert(idx.signatures.where(col("doc_id").isin(1L, 31L)).count() == 0L)
    assert(idx.signatures.count() == 43L)
  }
}
