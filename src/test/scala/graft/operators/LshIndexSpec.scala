package graft.operators

import graft.SparkSpec
import graft.core.VectorTable
import org.apache.spark.sql.functions._

case class LiDoc(doc_id: Long, text: String)

/** Incremental LSH index: build + refresh must be lossless vs recomputing
  * signatures from scratch, refresh must only hash the appended span, and
  * staleness must be detectable.
  */
class LshIndexSpec extends SparkSpec {

  private def mkDocs(ids: Range, dup: Boolean): Seq[LiDoc] =
    ids.map { i =>
      val base = s"alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima " +
        s"mike november oscar papa quebec romeo sierra tango uniform victor whiskey"
      // duplicates share text exactly; uniques get a distinctive suffix
      if (dup && i % 10 == 0) LiDoc(i.toLong, base)
      else LiDoc(i.toLong, s"$base unique token${i * 7919} marker${i * 104729}")
    }

  private def scratchPairs(docs: Seq[LiDoc]): Set[(Long, Long)] = {
    import spark.implicits._
    Dedup.pairsFromBands(Dedup.bandsOf(Dedup.signaturesOf(docs.toDF())))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("index pairs equal from-scratch pairs; refresh is lossless") {
    import spark.implicits._
    val a = mkDocs(0 until 40, dup = true)
    val b = mkDocs(40 until 80, dup = true)
    val root = tmpDir("lshidx")
    val t = VectorTable.create(spark, s"$root/table")
    t.append(a.toDF())
    val idx = LshIndex.build(t, s"$root/index")
    val afterBuild = idx.bands.count()

    t.append(b.toDF())
    assert(idx.isStale(t))
    val idx2 = idx.refresh(t)
    assert(!idx2.isStale(t))

    // refresh appended exactly the new docs' band rows (3 bands per doc)
    val afterRefresh = idx2.bands.count()
    assert(afterBuild == a.size * 3L, s"build rows: $afterBuild")
    assert(afterRefresh - afterBuild == b.size * 3L, s"refresh delta: ${afterRefresh - afterBuild}")

    val fromIndex = idx2.candidatePairs()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fromScratch = scratchPairs(a ++ b)
    assert(fromIndex == fromScratch, s"index=$fromIndex\nscratch=$fromScratch")
    // the exact-duplicate docs (every 10th) must pair up across the two
    // ingest stages — i.e. candidates BRIDGE the build/refresh boundary
    assert(fromIndex.contains((0L, 50L)) || fromIndex.contains((10L, 50L)),
      s"no cross-stage pair found in $fromIndex")
  }

  test("refresh on an unchanged table is a no-op; reopen preserves metadata") {
    import spark.implicits._
    val root = tmpDir("lshidx2")
    val t = VectorTable.create(spark, s"$root/table")
    t.append(mkDocs(0 until 20, dup = false).toDF())
    val idx = LshIndex.build(t, s"$root/index")
    assert(idx.refresh(t) eq idx)
    val reopened = LshIndex.open(spark, s"$root/index")
    assert(reopened.builtFromVersion == idx.builtFromVersion &&
      reopened.indexedLength == idx.indexedLength)
    assert(!reopened.isStale(t))
  }
}
