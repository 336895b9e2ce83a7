package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two-pass Misra–Gries heavy-hitter shape must be EXACT: the bounded
  * per-partition summary may only ever produce a candidate superset, so
  * after the exact recount the result equals a plain GROUP BY/HAVING. The
  * adversarial input forces summary evictions (far more distinct keys per
  * partition than counters) with true heavy hitters spread across
  * partitions.
  */
class HeavyHittersSpec extends SparkSpec {

  private def mgCandidates(values: Seq[Long], partitions: Int): Set[Long] = {
    import spark.implicits._
    values.toDS().repartition(partitions).mapPartitions { it =>
      val counters = scala.collection.mutable.LongMap.empty[Long]
      it.foreach { v =>
        if (counters.contains(v)) counters(v) += 1
        else if (counters.size < Events.hhCounters) counters(v) = 1L
        else {
          val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
          counters.foreachEntry((k, c) => if (c == 1L) dead += k else counters(k) = c - 1)
          dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.collect().toSet
  }

  test("MG candidates + exact recount == direct GROUP BY under eviction pressure") {
    // 40k rows: 3 heavy keys (>1/k of mass each), a 10k-key long tail that
    // overflows the 256-counter summary thousands of times per partition
    val rnd = new scala.util.Random(7)
    val heavy = Seq.fill(2000)(1L) ++ Seq.fill(1500)(2L) ++ Seq.fill(900)(3L)
    val tail = Seq.fill(36000)(1000L + rnd.nextInt(10000))
    val values = rnd.shuffle(heavy ++ tail)
    val n = values.size.toLong

    val direct = values.groupBy(identity).collect {
      case (v, occ) if occ.size.toLong * Events.hhK > n => v -> occ.size.toLong
    }.toMap
    assert(direct.keySet == Set(1L, 2L, 3L), s"test data must make exactly 1,2,3 heavy: $direct")

    val cands = mgCandidates(values, partitions = 8)
    // superset guarantee: no heavy hitter can be evicted everywhere
    assert(direct.keySet.subsetOf(cands))
    // and the summary stayed bounded
    assert(cands.size <= Events.hhCounters * 8)

    val recounted = values.filter(cands).groupBy(identity).collect {
      case (v, occ) if occ.size.toLong * Events.hhK > n => v -> occ.size.toLong
    }.toMap
    assert(recounted == direct)
  }

  test("declared events_heavy_hitters equals plain groupBy on the real table") {
    val hh = Events.heavyHitters(spark, sf())
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("cnt")).toMap
    val ev = graft.core.Tables.events(spark, sf())
    val n = ev.count()
    val direct = ev.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * Events.hhK > n)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("cnt")).toMap
    assert(hh == direct)
  }

  test("recount probes candidates via broadcast LEFT SEMI join, not an IN-list") {
    val df = Events.heavyHitters(spark, sf())
    df.collect() // materialize so AQE settles the final join strategy
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a left-semi recount join:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate probe should broadcast the tiny candidate set:\n${plan.take(3000)}")
    assert(!plan.contains("isInCollection") && !plan.toLowerCase.contains(" in ("),
      "candidate set must not be compiled into the predicate as literals")
  }
}
