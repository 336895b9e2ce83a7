package graft

import org.apache.spark.sql.functions._

/** Every declared query runs at sf0.001 and produces a sane result. The
  * bit-exact oracle comparison happens in the driver gate (and locally via
  * tools/oracle_check.py at sf0.01); these specs pin row-level semantics
  * cheaply so `sbt test` catches regressions without DuckDB.
  */
class QueryCorpusSpec extends SparkSpec {

  // Queries allowed to be empty at tiny scale (selective predicates).
  // q11/q20: at sf0.001 the single-nation supplier slice behind both can
  // be empty (~4 suppliers/nation); both return rows at the sf0.01 oracle
  // gate (238 / 4 rows).
  private val mayBeEmpty = Set("customers_without_orders", "embedding_near_dups",
    "dedup_lsh_candidates", "dedup_jaccard_verified",
    "q11_important_parts", "q20_volume_share_suppliers")

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs at sf0.001 with stable schema and sane rows") {
      val df = fn(spark, sf())
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length == df.columns.length, "duplicate column names")
    }
  }

  test("every query has an oracle SQL (driver gate coverage)") {
    // approx sketches are engine-specific by design → rows-only check
    val noOracleByDesign = Set("approx_sketches")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- noOracleByDesign
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("entry flagship query returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 semantic pin: group count and total quantity match raw scan") {
    val li = graft.core.Tables.lineitem(spark, sf())
    val q1 = graft.operators.Relational.q1PricingSummary(spark, sf())
    assert(q1.agg(sum("count_order")).head().getLong(0) == li.count())
  }

  test("top10 is globally ordered descending by price") {
    val rows = graft.operators.Relational.top10Lineitems(spark, sf()).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("price"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("dedup_exact: member counts sum to document count") {
    val docs = graft.core.Tables.documents(spark, sf())
    val dd = graft.operators.Dedup.exactDedup(spark, sf())
    assert(dd.agg(sum("n_members")).head().getLong(0) == docs.count())
  }

  test("knn returns k ordered descending similarities within [-1, 1]") {
    val rows = graft.operators.Similarity.bruteForceKnn(spark, sf()).collect()
    assert(rows.length == graft.operators.Similarity.knnK)
    val sims = rows.map(_.getAs[Double]("sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
  }

  test("sliding windows double-count each event (1h window, 30m slide)") {
    val ev = graft.core.Tables.events(spark, sf())
    val slid = graft.operators.Events.slidingCounts(spark, sf())
    assert(slid.agg(sum("n")).head().getLong(0) == 2 * ev.count())
  }

  test("sessions partition all events exactly once") {
    val ev = graft.core.Tables.events(spark, sf())
    val sess = graft.operators.Events.userSessions(spark, sf())
    assert(sess.agg(sum("n")).head().getLong(0) == ev.count())
  }
}
