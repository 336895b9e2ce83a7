package graft.operators

import graft.SparkSpec
import graft.core.VectorTable
import org.apache.spark.sql.catalyst.expressions.{In, InSet}
import org.apache.spark.sql.functions._

/** Round-17 (round-16 verdict #4): takedown ids at GDPR-BATCH scale. A
  * right-to-be-forgotten batch routinely names 10⁵–10⁶ ids; routing them
  * through `isInCollection` would inline the whole set as an IN literal in
  * every task. The DataFrame overload must reach the plan as a semi-JOIN
  * (AQE broadcasts small sets, shuffle-joins huge ones) — pinned on the
  * optimized plan — and compose with index propagation + purge unchanged.
  */
class TakedownScaleSpec extends SparkSpec {
  import spark.implicits._

  test("1e5-id takedown compiles to a semi-join — no IN/InSet literal anywhere in the plan") {
    val dir = tmpDir("takedown-scale")
    val t = VectorTable.create(spark, s"$dir/t")
    t.append((0 until 2000).map(i =>
      (i.toLong, s"alpha$i bravo$i charlie$i delta$i")).toDF("doc_id", "text"))
    // 1e5 ids, of which 200 exist in the store (every 10th of the first 2000)
    val ids = spark.range(0, 1000000, 10).select(col("id").as("doc_id"))
    assert(ids.count() == 100000L)

    // plan pin on the exact frame the delete path builds
    val hits = t.deleteHitsFrame(t.manifest, "doc_id", ids)
    val plan = hits.queryExecution.optimizedPlan
    val hasInLiteral = plan.collect { case p => p }.exists(_.expressions.exists(e =>
      e.exists(x => x.isInstanceOf[In] || x.isInstanceOf[InSet])))
    assert(!hasInLiteral, s"batch-id delete must not inline an IN literal:\n$plan")
    assert(plan.toString.contains("LeftSemi"), s"expected a semi-join plan:\n$plan")

    // end to end through the composed takedown, with a registered index
    var lsh = LshIndex.build(t, s"$dir/lsh")
    val counts = Takedown.everywhere(ids,
      Seq(Takedown.Store("docs", t, "doc_id", refreshIndexes = Seq(
        () => { lsh = lsh.refresh(t); () }))),
      propagate = Nil, purge = true)
    assert(counts("docs") == 200L)
    assert(t.liveCount == 1800L)
    assert(t.scan().where(col("doc_id") % 10 === 0).count() == 0L,
      "victims must be physically purged")
    assert(lsh.bands.where(col("doc_id") % 10 === 0).count() == 0L,
      "the registered index must be refreshed before the purge")
    // idempotent: a second batch takedown of the same ids masks nothing
    val again = Takedown.everywhere(ids,
      Seq(Takedown.Store("docs", t, "doc_id")), Nil, purge = true)
    assert(again("docs") == 0L)
  }
}
