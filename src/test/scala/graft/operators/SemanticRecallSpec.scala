package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The semantic-dedup recall face ([[Similarity.semanticRecall]]) and the
  * boundary-recovery variant ([[Similarity.semanticDedupMultiprobe]]):
  * the cell-scope miss class must be REPORTED (recall < 1000 on a
  * boundary-straddling fixture), top-2 assignment must recover it, and
  * the multiprobe verdicts must only ever merge (never split) the
  * single-cell components.
  */
class SemanticRecallSpec extends SparkSpec {

  test("boundary-straddling pair: cell scope reports the miss, top2 recovers it") {
    import spark.implicits._
    // a–b straddle cells 0/1 at cosine ≈ 0.9; c–d sit together in cell 2.
    // No other pair crosses 0.35.
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.44f)),
      (3L, Array(-1f, 0f)), (4L, Array(-0.9f, 0.44f)))
      .toDF("vec_id", "embedding")
    val assign = Seq((1L, 0), (2L, 1), (3L, 2), (4L, 2)).toDF("vec_id", "cell")
    val top2 = Seq(
      (1L, Some(0), Some(1)), (2L, Some(1), Some(0)),
      (3L, Some(2), None), (4L, Some(2), None))
      .toDF("vec_id", "c1", "c2")
    val r = Similarity.semanticRecallOf(assign, top2, emb, Seq(350))
      .collect().map(x => x.getString(0) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))).toMap
    assert(r("cell") == ((2L, 1L, 1L, 500L)),
      s"cell scope must report the straddling miss: ${r("cell")}")
    assert(r("top2") == ((2L, 2L, 0L, 1000L)),
      s"top2 must recover the straddling pair: ${r("top2")}")
  }

  test("corpus recall: top2 detects at least what the cell scope does") {
    val rows = Similarity.semanticRecall(spark, sf())
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    Similarity.semanticRecallThresholds.foreach { t =>
      assert(rows(("top2", t)) >= rows(("cell", t)),
        s"top2 detected fewer pairs than single-cell at $t")
    }
  }

  test("multiprobe only merges: single-cell dropped set is preserved") {
    val single = Similarity.semanticDedup(spark, sf())
      .where(!col("keep")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val multi = Similarity.semanticDedupMultiprobe(spark, sf())
      .where(!col("keep")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(single.subsetOf(multi),
      s"multiprobe un-dropped ${(single -- multi).take(5)} — merging can only drop more")
    // structure: one keeper per cluster, keeper is the min id
    val v = Similarity.semanticDedupMultiprobe(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    v.groupBy(_._2).foreach { case (cid, ms) =>
      assert(ms.count(_._3) == 1, s"cluster $cid has ${ms.count(_._3)} keepers")
      assert(ms.filter(_._3).head._1 == ms.map(_._1).min && cid == ms.map(_._1).min)
    }
  }
}
