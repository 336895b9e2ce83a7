package graft.streaming

import graft.SparkSpec
import graft.operators.Pipeline
import org.apache.spark.sql.functions._

/** The composed streaming refinery (quality → exact → span coverage →
  * lexical near-dup → decontamination → semantic, one write path) against
  * its batch replay:
  *   - the streamed per-batch stage counts sum EXACTLY to the batch
  *     face's global counts (set-level semantics survive micro-batching);
  *   - the two landed stores stay id-aligned (docs ids ≡ embedding ids);
  *   - the declared face's semantic-stage invariants hold (landed
  *     independent within cells, dropped dominated by a smaller landed id);
  *   - accounting closes: landed = semantic input − semantic drops.
  */
class RefineryIngestSpec extends SparkSpec {

  private lazy val root = Pipeline.refineryRoot(spark, sf())
  private lazy val counts = {
    val Array(in, q, x, sp, lx, c, s, l) = java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "counts.txt")).trim.split(",").map(_.toLong)
    (in, q, x, sp, lx, c, s, l)
  }
  private lazy val face = Pipeline.ingestGates(spark, sf()).head()

  test("streamed stage totals equal the batch replay's global counts") {
    val (in, q, x, sp, lx, c, _, _) = counts
    assert(in == face.getAs[Long]("n_input"))
    assert(q == face.getAs[Long]("n_quality_dropped"))
    assert(x == face.getAs[Long]("n_exact_dropped"))
    assert(sp == face.getAs[Long]("n_span_dropped"))
    assert(lx == face.getAs[Long]("n_lexical_dropped"))
    assert(c == face.getAs[Long]("n_contam_dropped"))
  }

  test("accounting closes and the semantic invariants hold") {
    val (_, _, _, _, _, _, semDropped, landed) = counts
    assert(face.getAs[Long]("n_semantic_input") == landed + semDropped)
    assert(face.getAs[Boolean]("kept_independent"))
    assert(face.getAs[Boolean]("dropped_dominated"))
  }

  test("docs and embedding stores land the same ids, in id order") {
    val docIds = graft.core.VectorTable.open(spark, s"$root/docs")
      .scan().select("vec_id").collect().map(_.getLong(0)).toSeq
    val embIds = graft.core.VectorTable.open(spark, s"$root/emb")
      .scan().select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(docIds.sorted == embIds.sorted, "stores must stay id-aligned")
    assert(docIds.nonEmpty)
  }

  test("every landed id survives all four gates on batch replay") {
    // landed ⊆ semantic input (quality, exact and contamination survivors)
    val landed = graft.core.VectorTable.open(spark, s"$root/docs")
      .scan().select(col("vec_id"))
    val landedCount = landed.count()
    val semInputIds = {
      // replay stages 1-3 exactly as the declared face does
      val docs = graft.core.Tables.documents(spark, sf())
        .where(col("doc_id") % Pipeline.refineryEvalMod =!= 0)
      val gated = docs
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("q",
          size(array_distinct(col("toks"))).cast("double") / col("n_tokens").cast("double") * 2.0
            + (col("n_chars").cast("double") - (col("n_tokens").cast("double") - 1.0)) / col("n_tokens").cast("double") * 0.1
            - expr("CAST(size(filter(toks, t -> t IN ('the','a','of','and'))) AS DOUBLE)") / col("n_tokens").cast("double"))
        .where(col("q") >= Pipeline.minQuality)
        .select(col("doc_id"), col("text"))
      gated
        .withColumn("keep_id", min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))))
        .where(col("doc_id") === col("keep_id"))
        .select(col("doc_id").as("vec_id"))
    }
    assert(landed.join(semInputIds, Seq("vec_id"), "left_anti").count() == 0,
      "no landed row may have failed quality or exact-dedup")
    assert(landedCount > 0)
  }
}
