package graft.operators

import graft.SparkSpec
import graft.core.VectorTable
import org.apache.spark.sql.functions._

/** Round-17: incremental refresh must refuse a RESTORED table. restore()
  * rewinds the head and later appends REUSE the dropped rowid range with
  * different content — an append-only span refresh cannot see that (the
  * indexed prefix "didn't grow"), so without the guard every index family
  * silently serves pre-restore rows for reused rowids. The manifest's
  * restore-epoch counter (the [[graft.core.MaterializedAggView]] protocol)
  * makes the corruption detectable; the only sound continuation is a
  * rebuild, and a rebuild over the restored table records the new epoch
  * and refreshes normally from there.
  */
class RestoreIndexGuardSpec extends SparkSpec {
  import spark.implicits._

  private def docRows(ids: Range, tag: String = "") =
    ids.map(i => (i.toLong, s"alpha$tag$i bravo$tag$i charlie$tag$i delta$tag$i"))
      .toDF("doc_id", "text")

  test("refresh after restore fails loudly; a rebuild records the new epoch") {
    val dir = tmpDir("restore-guard")
    val t = VectorTable.create(spark, s"$dir/t")
    t.append(docRows(0 until 20))
    val v1 = t.manifest.version
    var idx = LshIndex.build(t, s"$dir/lsh")
    var sec = graft.core.SecondaryIndex.build(t, "doc_id", s"$dir/sec")
    t.append(docRows(20 until 30))
    t.restore(v1)
    // the reused-rowid hazard: regrow over the dropped range with new docs
    t.append(docRows(100 until 110, tag = "x"))
    val e1 = intercept[IllegalStateException](idx.refresh(t))
    assert(e1.getMessage.contains("restore-epoch"))
    val e2 = intercept[IllegalStateException](sec.refresh(t))
    assert(e2.getMessage.contains("rebuild"))
    // rebuild at a fresh root: records epoch 1, indexes the restored
    // content, and a later append refreshes incrementally again
    idx = LshIndex.build(t, s"$dir/lsh2")
    assert(idx.indexedRestores == 1L)
    assert(idx.bands.where(col("doc_id") >= 20 && col("doc_id") < 30).count() == 0L,
      "rolled-back docs must not be indexed")
    assert(idx.bands.where(col("doc_id") >= 100).select("doc_id").distinct().count() == 10L)
    sec = graft.core.SecondaryIndex.build(t, "doc_id", s"$dir/sec2")
    t.append(docRows(200 until 205, tag = "y"))
    idx = idx.refresh(t)
    sec = sec.refresh(t)
    assert(idx.bands.where(col("doc_id") >= 200).select("doc_id").distinct().count() == 5L)
    assert(sec.lookup(200L).nonEmpty)
  }

  test("IVF refresh after restore fails loudly too") {
    val dir = tmpDir("restore-guard-ivf")
    val emb = graft.core.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding")).limit(60)
    val t = VectorTable.create(spark, s"$dir/t")
    t.append(emb.where(col("vec_id") < 40))
    val v1 = t.manifest.version
    val cs = emb.orderBy("vec_id").limit(4).collect().map(_.getSeq[Float](1).toArray)
    val idx = IvfTableIndex.buildWith(t, s"$dir/ivf", cs)
    t.append(emb.where(col("vec_id") >= 40))
    t.restore(v1)
    t.append(emb.where(col("vec_id") >= 40)) // reuse the rowid range
    intercept[IllegalStateException](idx.refresh(t))
    // a rebuild with the SAME fixed centroids serves the restored state
    val fresh = IvfTableIndex.buildWith(t, s"$dir/ivf2", cs)
    assert(fresh.indexedRestores == 1L)
    assert(fresh.data.count() == t.liveCount)
  }
}
