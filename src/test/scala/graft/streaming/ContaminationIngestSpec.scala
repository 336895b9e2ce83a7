package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Decontamination-at-ingest ([[ContaminationIngest]] through
  * [[Similarity.contaminationIngestRoot]]): the stream-landed id set must
  * equal the batch face's complement exactly, replays must be no-ops, and
  * re-running the contamination pass over the landed rows must find
  * nothing.
  */
@graft.SlowTest
class ContaminationIngestSpec extends SparkSpec {

  test("stream-landed set ≡ corpus minus the batch face's contaminated set") {
    val d = sf()
    val root = Similarity.contaminationIngestRoot(spark, d)
    val landed = graft.core.VectorTable.open(spark, s"$root/table")
      .scan().select("vec_id").collect().map(_.getLong(0)).toSet
    val corpus = graft.core.Tables.embeddings(spark, d)
      .where(col("vec_id") % 50 =!= 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val contaminated = Similarity.semanticContamination(spark, d)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(contaminated.nonEmpty, "fixture has no contamination — gate untested")
    assert(landed == corpus.diff(contaminated),
      s"landed diverges: extra=${(landed -- corpus.diff(contaminated)).take(5)} " +
        s"missing=${(corpus.diff(contaminated) -- landed).take(5)}")
    val r = Similarity.semanticContaminationIngest(spark, d).head()
    assert(r.getBoolean(3), s"gate invariants failed: $r")
  }

  test("replayed batch is a no-op; contaminated-only batch lands nothing") {
    import spark.implicits._
    val dir = tmpDir("contam-gate")
    val t = graft.core.VectorTable.create(spark, s"$dir/table")
    val evalIds = Array(0L)
    val evalVecs = Array(Array(1f, 0f))
    val b1 = Seq((10L, Array(1f, 0.01f)), (11L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val (k1, d1) = ContaminationIngest.appendClean(t, b1, evalIds, evalVecs, Some(0L))
    assert((k1, d1) == ((1L, 1L)))
    // replay of batch 0 must not double-land
    assert(ContaminationIngest.appendClean(t, b1, evalIds, evalVecs, Some(0L)) == ((0L, 0L)))
    assert(t.length == 1L)
    // a batch that is ALL leakage lands nothing
    val b2 = Seq((20L, Array(0.99f, 0.02f)), (21L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val (k2, d2) = ContaminationIngest.appendClean(t, b2, evalIds, evalVecs, Some(1L))
    assert((k2, d2) == ((0L, 2L)) && t.length == 1L)
  }
}
