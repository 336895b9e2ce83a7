package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-scaled IVF cell count: the cell count must grow with the corpus
  * (a fixed count is the index that stops indexing — at 8 cells every
  * probe scans >= 1/8 of the corpus forever), while staying EXACTLY the
  * oracle's constant at every gate scale factor, and the high-cell-count
  * assignment kernel must be bit-identical to the inline form it replaces.
  */
class IvfScaleSpec extends SparkSpec {

  test("cellsFor is monotone, clamped, and == oracleCells at all oracle SFs") {
    // oracle corpora: sf0.001 = 50 vectors, sf0.01 = 500 — both must land
    // exactly on the constant the baked oracle SQL assumes
    for (d <- Seq(sf(), sf("sf0.01"))) {
      val n = graft.core.Tables.embeddings(spark, d).count()
      assert(Similarity.cellsFor(n) == Similarity.oracleCells,
        s"oracle corpus $d ($n vectors) must use ${Similarity.oracleCells} cells")
    }
    // monotone growth past the oracle regime
    val ns = Seq(1L, 512L, 513L, 5000L, 100000L, 10000000L, Long.MaxValue / 2)
    val cells = ns.map(Similarity.cellsFor)
    assert(cells == cells.sorted, s"cellsFor not monotone: ${ns.zip(cells)}")
    assert(Similarity.cellsFor(513L) > Similarity.oracleCells,
      "cell count must start growing right past the oracle regime")
    assert(Similarity.cellsFor(5000L) == 79) // the sf0.1 bench corpus
    assert(cells.last == Similarity.maxCells, "cap must bind at huge n")
    // mean occupancy at the target once the clamps are off (100k vectors →
    // ceil(100000/64) = 1563 cells, i.e. ~64 vectors/cell)
    assert(Similarity.cellsFor(100000L) == 1563)
  }

  test("kernel assignment (cells > inlineCellCap) is bit-identical to the inline form") {
    // force both paths over the same corpus and centroid set: 40 centroids
    // exceeds inlineCellCap (32), so assignWith takes the kernel; the
    // inline twin is built here exactly as assignWith's low-cell branch
    val d = sf()
    val emb = graft.core.Tables.embeddings(spark, d)
    val cs = emb.where(col("vec_id") < 40L).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    assert(cs.length > Similarity.inlineCellCap)
    val viaKernel = Similarity.assignWith(spark, d, cs)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val simsInline = array(cs.indices.map(j =>
      graft.functions.VectorFunctions.cosineF(col("embedding"), lit(cs(j)))): _*)
    val viaInline = emb.withColumn("sims", simsInline)
      .withColumn("centroid_sim", array_max(col("sims")))
      .withColumn("cell", (array_position(col("sims"), col("centroid_sim")) - 1).cast("int"))
      .select("vec_id", "cell", "centroid_sim")
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(viaKernel.sameElements(viaInline),
      "kernel and inline assignment must agree bit-for-bit")
  }

  test("centroid_sims kernel stays inside whole-stage codegen") {
    val cs = graft.core.Tables.embeddings(spark, sf())
      .where(col("vec_id") < 40L).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val plan = Similarity.assignWith(spark, sf(), cs)
      .queryExecution.executedPlan.toString
    val codegenLines = plan.linesIterator.filter(_.contains("*(")).mkString("\n")
    assert(codegenLines.toLowerCase.contains("centroidsims"),
      s"centroid_sims outside codegen:\n$plan")
  }
}
