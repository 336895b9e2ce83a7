package graft.core

import graft.SparkSpec

/** Round-17 (round-16 ADVICE, low): [[VectorTable.compactTail]] must be
  * SIZE-TIERED — the previously merged batch re-enters a merge only once
  * the NEW small batches alone match it in rows. The naive
  * whole-tail-every-time rule rewrites each row ~target/(factor×batch)
  * times (quadratic write amplification); the geometric rule bounds it at
  * O(log n) merges per row.
  */
class CompactTailTierSpec extends SparkSpec {
  import spark.implicits._

  private def rows(lo: Int, n: Int) =
    (lo until lo + n).map(i => (i.toLong, s"v$i")).toDF("id", "v")

  test("a merged batch is excluded from the next merge until new mass matches it") {
    val dir = tmpDir("tier")
    val t = VectorTable.create(spark, s"$dir/t")
    val target = 1000000L
    (0 until 9).foreach(b => t.append(rows(b * 100, 100)))
    assert(t.compactTail(target, maxTailBatches = 8), "9 small batches must merge")
    assert(t.manifest.batches.size == 1)
    val merged = t.manifest.batches.head
    assert(merged.end - merged.start == 900L)

    // 8 new small batches: 800 new rows < the 900-row merged batch, so the
    // merged batch must NOT be rewritten and no merge fires (suffix of 8)
    (9 until 17).foreach(b => t.append(rows(b * 100, 100)))
    assert(!t.compactTail(target, maxTailBatches = 8),
      "new mass below the merged batch must not re-merge it")
    assert(t.manifest.batches.size == 9)
    assert(t.manifest.batches.head == merged, "the merged batch is untouched")

    // the 9th new batch tips new mass to 900 >= 900: everything merges
    t.append(rows(1700, 100))
    assert(t.compactTail(target, maxTailBatches = 8))
    val m = t.manifest
    assert(m.batches.size == 1 && m.batches.head.start == 0L && m.batches.head.end == 1800L)
    // rowids and rows preserved end to end
    assert(t.scan().count() == 1800L)
    assert(t.scan().agg(org.apache.spark.sql.functions.countDistinct(
      org.apache.spark.sql.functions.col(VectorTable.ROWID))).head.getLong(0) == 1800L)
  }
}
