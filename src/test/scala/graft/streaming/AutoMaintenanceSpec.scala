package graft.streaming

import graft.SparkSpec
import graft.operators.{IndexCompaction, IvfTableIndex, LshIndex, Maintenance, SpanIndex}
import org.apache.spark.sql.functions._

/** Round-16: AUTOMATIC maintenance — a long-running composed-refinery
  * ingest must end with BOUNDED files per store and per index without any
  * manual compaction call (the round-15 verdict: "the disease is cured
  * but the cure isn't scheduled"). Drives `appendRefined` for 3× the
  * policy factor batches and pins the bounds; also pins the composed
  * refinery takedown (one call → victims gone from every store and
  * index-served surface, bytes purged).
  */
class AutoMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def goodText(tag: String) =
    s"alpha$tag bravo$tag charlie$tag delta$tag echo$tag foxtrot$tag"

  private def freshStores(tag: String) = {
    val dir = tmpDir(s"maint-$tag")
    val docs = graft.core.VectorTable.create(spark, s"$dir/docs")
    val hashes = graft.core.VectorTable.create(spark, s"$dir/hashes")
    val spans = graft.core.VectorTable.create(spark, s"$dir/spans")
    val lex = graft.core.VectorTable.create(spark, s"$dir/lex")
    val emb = graft.core.VectorTable.create(spark, s"$dir/emb")
    val spanIdx = new java.util.concurrent.atomic.AtomicReference(
      SpanIndex.build(spans, s"$dir/spanindex"))
    val lexIdx = new java.util.concurrent.atomic.AtomicReference(
      LshIndex.build(lex, s"$dir/lexindex"))
    val idx = new java.util.concurrent.atomic.AtomicReference(
      IvfTableIndex.buildWith(emb, s"$dir/index",
        Array(Array(1f, 0f, 0f), Array(0f, 1f, 0f))))
    (docs, hashes, spans, lex, emb, spanIdx, lexIdx, idx)
  }

  private val evalIds = Array(999999L)
  private val evalVecs = Array(Array(0f, 0f, 1f))

  // distinct unit vectors 0.02 rad apart in the xy-plane: pairwise cosine
  // <= cos(0.02) ≈ 0.9998, so a 0.9999 semantic threshold never drops a
  // distinct doc while still catching exact copies
  private def vec(id: Long): Array[Float] =
    Array(math.cos(0.02 * id).toFloat, math.sin(0.02 * id).toFloat, 0f)
  private val semThreshold = 0.9999

  test("N-batch refinery run ends with bounded files everywhere, no manual compaction") {
    val (docs, hashes, spans, lex, emb, spanIdx, lexIdx, idx) = freshStores("bounded")
    val factor = Maintenance.fileFactor.toInt
    val nBatches = 3 * factor
    var id = 0L
    (0 until nBatches).foreach { b =>
      val rows = (0 until 4).map { _ =>
        id += 1
        (id, goodText(s"b${b}i$id"), vec(id))
      }
      RefineryIngest.appendRefined(docs, hashes, spans, lex, emb,
        spanIdx, lexIdx, idx, rows.toDF("vec_id", "text", "embedding"),
        evalIds, evalVecs, graft.operators.Pipeline.minQuality, semThreshold,
        streamBatchId = Some(b.toLong))
    }
    // every batch landed rows (distinct content, sub-threshold sims)
    assert(docs.length >= nBatches.toLong, s"landed only ${docs.length}")
    // stores: the small-batch tail merges at the policy bound, so the
    // manifest never accumulates one batch dir per micro-batch
    Seq("docs" -> docs, "hashes" -> hashes, "spans" -> spans,
      "lex" -> lex, "emb" -> emb).foreach { case (n, t) =>
      assert(t.manifest.batches.size <= factor + 1,
        s"$n store unbounded: ${t.manifest.batches.size} batch dirs after $nBatches batches")
    }
    // flat indexes: live file count stays within policy of the byte target
    Seq("spanindex" -> spanIdx.get().root, "lexindex" -> lexIdx.get().root)
      .foreach { case (n, root) =>
        val files = IndexCompaction.liveFileCount(root)
        assert(files <= Maintenance.fileFactor * IndexCompaction.targetFiles(root) + 1,
          s"$n unbounded: $files files after $nBatches batches")
      }
    // partitioned IVF: files per cell stays within policy
    val fpc = idx.get().filesPerCell()
    assert(fpc.values.forall(_ <= Maintenance.fileFactor + 1),
      s"ivf cells unbounded: $fpc")
    // and the refinery still works after all that maintenance: one more
    // batch with a replayed id is a no-op, a fresh batch lands
    val before = docs.length
    id += 1
    val c = RefineryIngest.appendRefined(docs, hashes, spans, lex, emb,
      spanIdx, lexIdx, idx,
      Seq((id, goodText(s"final$id"), vec(id)))
        .toDF("vec_id", "text", "embedding"),
      evalIds, evalVecs, graft.operators.Pipeline.minQuality, semThreshold,
      streamBatchId = Some(nBatches.toLong))
    assert(c.landed == 1L && docs.length == before + 1)
  }

  test("composed refinery takedown: one call, victims gone from every surface, bytes purged") {
    val (docs, hashes, spans, lex, emb, spanIdx, lexIdx, idx) = freshStores("takedown")
    var id = 0L
    (0 until 4).foreach { b =>
      val rows = (0 until 5).map { _ =>
        id += 1
        (id, goodText(s"b${b}i$id"), vec(id))
      }
      RefineryIngest.appendRefined(docs, hashes, spans, lex, emb,
        spanIdx, lexIdx, idx, rows.toDF("vec_id", "text", "embedding"),
        evalIds, evalVecs, graft.operators.Pipeline.minQuality, semThreshold,
        streamBatchId = Some(b.toLong))
    }
    val victims = Seq(3L, 7L, 12L)
    val counts = RefineryIngest.takedown(victims, docs, hashes, spans, lex,
      emb, spanIdx, lexIdx, idx)
    assert(counts("docs") == 3L && counts("emb") == 3L)
    // no store's PHYSICAL surface serves a victim (purged, not just masked)
    Seq(docs -> "vec_id", hashes -> "vec_id", spans -> "doc_id",
      lex -> "doc_id", emb -> "vec_id").foreach { case (t, idCol) =>
      assert(t.scan().where(col(idCol).isin(victims: _*)).count() == 0L,
        s"victims still physically present in ${t.root}")
      assert(t.manifest.maskCount == 0L, "purge must reset the mask")
    }
    // no index-served surface returns a victim
    assert(spanIdx.get().windows.where(col("doc_id").isin(victims: _*)).count() == 0L)
    assert(lexIdx.get().bands.where(col("doc_id").isin(victims: _*)).count() == 0L)
    assert(idx.get().data.where(col("vec_id").isin(victims: _*)).count() == 0L)
    // the takedown is idempotent end to end
    val again = RefineryIngest.takedown(victims, docs, hashes, spans, lex,
      emb, spanIdx, lexIdx, idx)
    assert(again.values.forall(_ == 0L))
  }
}
