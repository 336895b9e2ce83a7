package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The remaining TPC-H query shapes (Q2, Q8, Q11–Q22), adapted to the
  * driver's reduced star schema (SURVEY.md §2.5; no `partsupp`, no
  * commit/receipt dates, no comments/phones — each analog keeps the
  * original query's PHYSICAL shape and swaps only the missing columns for
  * available ones). Together with Q1/Q3/Q4/Q5/Q6/Q7/Q9/Q10 in
  * [[Relational]] this completes all 22 TPC-H plan shapes.
  *
  * Two deliberate API surfaces: most analogs use the DataFrame API (the
  * operator layer's native form); Q11/Q15/Q17/Q20/Q22 go through the SQL
  * front door ([[graft.GraftCatalog]]) because their essence is scalar /
  * nested subqueries, which only the SQL surface can express — and which
  * Catalyst must decorrelate or wrap as ScalarSubquery plans (never a
  * per-row re-execution).
  *
  * Determinism contract (same as [[Relational]]): every money/quantity
  * aggregate runs in exact DECIMAL arithmetic and casts to DOUBLE only at
  * the output boundary; counts use COUNT (never SUM over 0/1, whose DuckDB
  * result type is HUGEINT and prints differently); every comparison
  * against a derived average/fraction is rearranged into multiplication so
  * both engines compare exact decimals (`5 * qty * cnt < sum` instead of
  * `qty < 0.2 * sum / cnt`).
  */
object TpchFull {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def one: Column = lit(1).cast(DecimalType(18, 2))
  /** Exact per-row revenue `extendedprice * (1 - discount)`. */
  private def revenue: Column = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))

  // --- Q2: min-cost supplier per part (correlated MIN over a grouped
  // metric). Without partsupp, "supply cost" is the cheapest observed
  // lineitem price for the (part, supplier) pair.

  /** TPC-H Q2-shaped: for each part in a selective family, the supplier(s)
    * achieving the minimum supply cost — the correlated-MIN pattern.
    * Physical shape, scale-ordered: the part filter is applied FIRST and
    * joined into lineitem BEFORE any aggregation (AQE broadcasts the
    * filtered side when small; the runtime bloom filter prunes the
    * lineitem scan either way — q9's policy, no driver key-list), so the
    * (part, supplier) aggregate only sees surviving rows. The per-part
    * best cost is a window MIN over the aggregate — one extra shuffle on
    * partkey, both keyed shuffles tiny post-filter. supplier join is
    * AQE-decided; nation (25 rows, fixed) is the only forced broadcast.
    */
  def q2MinCostSupplier(s: SparkSession, d: String): DataFrame = {
    val partsF = Tables.part(s, d)
      .where(col("p_size") === 15 && col("p_type") === "STANDARD")
      .select("p_partkey")
    val li = Tables.lineitem(s, d).select("l_partkey", "l_suppkey", "l_extendedprice")
    val cost = li.join(partsF, li("l_partkey") === partsF("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(dec(col("l_extendedprice"))).as("cost_dec"))
    val w = Window.partitionBy("l_partkey")
    val best = cost.withColumn("best_dec", min(col("cost_dec")).over(w))
      .where(col("cost_dec") === col("best_dec"))
    val supp = Tables.supplier(s, d).select("s_suppkey", "s_name", "s_nationkey")
    val nation = Tables.nation(s, d)
    best.join(supp, best("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .select(col("l_partkey").as("partkey"), col("s_suppkey").as("suppkey"),
        col("s_name").as("supplier"), col("n_name").as("nation"),
        col("cost_dec").cast("double").as("cost"))
  }

  val q2MinCostSupplierSql: String =
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey, MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supply_cost
      |  FROM lineitem GROUP BY 1, 2),
      |best AS (SELECT l_partkey, MIN(supply_cost) AS best_cost FROM cost GROUP BY 1)
      |SELECT p_partkey AS partkey, s_suppkey AS suppkey, s_name AS supplier,
      |       n_name AS nation, CAST(c.supply_cost AS DOUBLE) AS cost
      |FROM part JOIN cost c ON p_partkey = c.l_partkey
      | JOIN best b ON c.l_partkey = b.l_partkey AND c.supply_cost = b.best_cost
      | JOIN supplier ON c.l_suppkey = s_suppkey
      | JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_size = 15 AND p_type = 'STANDARD'""".stripMargin

  // --- Q8: national market share (conditional share of a grouped total).

  /** TPC-H Q8-shaped: one nation's share of a region's order revenue by
    * year. The nation dimension plays two roles (customer's region
    * membership, supplier's nationality) — both roles broadcast (25/5
    * rows, fixed at any SF). customer and supplier joins are AQE-decided
    * (both SF-growing). The share is a conditional-aggregate ratio: both
    * numerator and denominator are exact decimal sums cast to DOUBLE at
    * the end, so the final IEEE division is bit-stable across engines.
    */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val region = Tables.region(s, d).where(col("r_name") === "AMERICA")
    val cn = Tables.nation(s, d).select(col("n_nationkey").as("cnk"), col("n_regionkey"))
    val custA = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      .join(broadcast(cn), col("c_nationkey") === col("cnk"))
      .join(broadcast(region), col("n_regionkey") === region("r_regionkey"))
      .select("c_custkey")
    val ordA = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate")
      .join(custA, col("o_custkey") === custA("c_custkey"))
      .select("o_orderkey", "o_orderdate")
    val sn = Tables.nation(s, d).select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    val suppN = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(sn), col("s_nationkey") === col("snk"))
      .select("s_suppkey", "supp_nation")
    Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ordA, col("l_orderkey") === ordA("o_orderkey"))
      .join(suppN, col("l_suppkey") === suppN("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_5", revenue)).cast("double") /
          sum(revenue).cast("double")).as("mkt_share"),
        count(lit(1)).as("n"))
  }

  val q8MarketShareSql: String =
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
      | CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
      |   THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share,
      | COUNT(*) AS n
      |FROM lineitem
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN nation cn ON c_nationkey = cn.n_nationkey
      | JOIN region ON cn.n_regionkey = r_regionkey
      | JOIN supplier ON l_suppkey = s_suppkey
      | JOIN nation sn ON s_nationkey = sn.n_nationkey
      |WHERE r_name = 'AMERICA'
      |GROUP BY 1""".stripMargin

  // --- Q11: parts whose value exceeds a fraction of the global total
  // (uncorrelated scalar subquery against the SAME aggregate).

  /** Shared Spark/DuckDB text (dialect-neutral). The fraction comparison
    * is `value * 1000 > total` — integer decimal multiplication, exact in
    * both engines (a decimal×0.001 would round differently). In Spark the
    * total plans as a ScalarSubquery (one tiny extra job, its single-row
    * result inlined into the filter) — never a join, never a driver
    * collect of the aggregate input.
    */
  val q11ImportantPartsSql: String =
    """WITH pv AS (
      | SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
      | FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      | WHERE n_name = 'NATION_7' GROUP BY 1)
      |SELECT l_partkey AS partkey, CAST(value_dec AS DOUBLE) AS value
      |FROM pv WHERE value_dec * 1000 > (SELECT SUM(value_dec) FROM pv)""".stripMargin

  /** TPC-H Q11-shaped via the SQL front door: per-part value restricted to
    * one supplier nation, kept only where it exceeds 1/1000 of the total.
    * At scale: the nation filter shrinks supplier before the fact join
    * (AQE/bloom — SF-growing, so no forced broadcast); the per-part
    * aggregate is the one real shuffle; the global total is a scalar
    * subquery over the already-aggregated (small) per-part frame.
    */
  def q11ImportantParts(s: SparkSession, d: String): DataFrame =
    graft.GraftCatalog.sql(s, d, q11ImportantPartsSql,
      Seq("lineitem", "supplier", "nation"))

  // --- Q12: shipping-delay census (conditional counts over a join).

  /** TPC-H Q12-shaped: lines bucketed by shipping delay class, split into
    * high/low-priority counts. COUNT(CASE…) not SUM(0/1): DuckDB's SUM on
    * integers yields HUGEINT (prints as float through pandas), COUNT stays
    * BIGINT on both engines. The shipdate window prunes the lineitem scan;
    * one shuffle on orderkey for the join (both sides co-located on
    * orderkey under bucketing at 100 TB), then a 3-group aggregate.
    */
  def q12DelayCensus(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .select("l_orderkey", "l_shipdate")
    val ord = Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority")
    val delay = datediff(col("l_shipdate"), col("o_orderdate"))
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .withColumn("delay_class",
        when(delay < 30, "on-time").when(delay < 90, "late").otherwise("very-late"))
      .groupBy("delay_class")
      .agg(count(when(isHigh, lit(1))).as("high_count"),
        count(when(!isHigh, lit(1))).as("low_count"))
  }

  val q12DelayCensusSql: String =
    """SELECT delay_class,
      | COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_count,
      | COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_count
      |FROM (SELECT o_orderpriority,
      |        CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN 'on-time'
      |             WHEN date_diff('day', o_orderdate, l_shipdate) < 90 THEN 'late'
      |             ELSE 'very-late' END AS delay_class
      |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |      WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01')
      |GROUP BY 1""".stripMargin

  // --- Q13: distribution of customers by order count (outer join +
  // double aggregation).

  /** TPC-H Q13-shaped: how many customers placed exactly k (non-5-LOW)
    * orders — LEFT OUTER join so zero-order customers survive with
    * c_count = 0, then a second aggregation over the first. At scale the
    * custkey aggregate is the real shuffle; the second groups ~50 distinct
    * counts, map-side combinable to almost nothing.
    */
  def q13CustomerDistribution(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d).where(col("o_orderpriority") =!= "5-LOW")
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(s, d).select("c_custkey")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  val q13CustomerDistributionSql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY 1) GROUP BY 1""".stripMargin

  // --- Q14: promotion revenue share in a month.

  /** TPC-H Q14-shaped: percentage of one month's revenue from PROMO-class
    * parts. The tight shipdate window prunes the lineitem scan to ~1/80 of
    * rows BEFORE the part join (filter-first ordering); part is unfiltered
    * and SF-growing, so that join shuffles on partkey under AQE — with
    * both tables bucketed on partkey at 100 TB it is exchange-free. The
    * conditional sum uses WHEN-without-otherwise (NULLs skipped by SUM),
    * ratio computed on exact decimals cast to DOUBLE at the boundary.
    */
  def q14PromoRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val part = Tables.part(s, d).select("p_partkey", "p_type")
    li.join(part, li("l_partkey") === part("p_partkey"))
      .agg(
        (lit(100).cast("double") *
          sum(when(col("p_type") === "PROMO", revenue)).cast("double") /
          sum(revenue).cast("double")).as("promo_share"),
        count(lit(1)).as("n"))
  }

  val q14PromoRevenueSql: String =
    """SELECT CAST(100 AS DOUBLE) *
      |  CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_share,
      | COUNT(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin

  // --- Q15: supplier(s) with the maximum quarterly revenue (scalar MAX
  // subquery over a CTE used twice).

  /** Shared Spark/DuckDB text. The revenue CTE feeds both the join and
    * the scalar MAX — Catalyst plans the MAX as a ScalarSubquery over the
    * per-supplier aggregate (supplier-count-sized, tiny), and decimal
    * equality against it is exact, so the "top supplier including ties"
    * row set is deterministic with no window and no sort.
    */
  val q15TopSupplierSql: String =
    """WITH rev AS (
      | SELECT l_suppkey,
      |   SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      | FROM lineitem
      | WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      | GROUP BY 1)
      |SELECT s_suppkey AS suppkey, s_name AS name, CAST(total_rev AS DOUBLE) AS total_revenue
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""".stripMargin

  /** TPC-H Q15-shaped via the SQL front door (see [[q15TopSupplierSql]]).
    * At scale: the quarter filter prunes the scan, one shuffle to the
    * per-supplier aggregate, and the MAX runs over that aggregate — not
    * over lineitem a second time.
    */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame =
    graft.GraftCatalog.sql(s, d, q15TopSupplierSql, Seq("lineitem", "supplier"))

  // --- Q16: supplier diversity census with an exclusion subquery.

  /** TPC-H Q16-shaped: distinct suppliers per (brand, type, size) for a
    * size family, excluding suppliers in bad standing — the NOT-IN
    * subquery plans as a LEFT ANTI join (the exclusion list is a filtered
    * slice of the SF-growing supplier table: AQE-decided, never a driver
    * list). The distinct count expands per group then two-phase
    * aggregates; the selective part filter prunes before the join.
    */
  def q16SupplierCensus(s: SparkSession, d: String): DataFrame = {
    val badSupp = Tables.supplier(s, d).where(col("s_acctbal") < 0).select("s_suppkey")
    val partsF = Tables.part(s, d)
      .where(col("p_brand") =!= "Brand#3" &&
        col("p_size").isin(1, 14, 23, 45, 19, 3, 36, 9))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val li = Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
    li.join(badSupp, li("l_suppkey") === badSupp("s_suppkey"), "left_anti")
      .join(partsF, li("l_partkey") === partsF("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val q16SupplierCensusSql: String =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#3' AND p_size IN (1, 14, 23, 45, 19, 3, 36, 9)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3""".stripMargin

  // --- Q17: revenue from unusually-small-quantity orders (correlated
  // per-part average).

  /** Shared Spark/DuckDB text. TPC-H's `l_quantity < 0.2 * avg(quantity)`
    * is rearranged to `5 * quantity * count < sum` — pure integer/decimal
    * multiplication, exact in both engines (an avg would divide and the
    * engines would round the quotient differently). The per-part aggregate
    * is written as a CTE join (the decorrelated form Catalyst would reach
    * anyway): it shuffles on partkey, the SAME key as the part join, so a
    * partkey-bucketed layout at 100 TB runs the whole query with zero
    * exchanges on the fact side.
    */
  val q17SmallQtyRevenueSql: String =
    """WITH pa AS (
      | SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq, COUNT(*) AS cq
      | FROM lineitem GROUP BY 1)
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |       COUNT(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey JOIN pa ON pk = l_partkey
      |WHERE p_brand = 'Brand#11'
      |  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cq < sq""".stripMargin

  /** TPC-H Q17-shaped via the SQL front door (see
    * [[q17SmallQtyRevenueSql]]).
    */
  def q17SmallQtyRevenue(s: SparkSession, d: String): DataFrame =
    graft.GraftCatalog.sql(s, d, q17SmallQtyRevenueSql, Seq("lineitem", "part"))

  // --- Q18: large-volume orders (HAVING pushed before the decoration
  // joins).

  /** TPC-H Q18-shaped: orders whose total quantity exceeds a threshold,
    * decorated with their customer. The quantity aggregate + HAVING runs
    * FIRST (collapsing lineitem to qualifying orderkeys — the analog of
    * Q18's `IN (… HAVING …)`), so the orders join sees only survivors;
    * the aggregate's hash partitioning on orderkey is reused by that join
    * (no second exchange on the aggregated side). customer join is
    * AQE-decided.
    */
  def q18LargeVolumeCustomers(s: SparkSession, d: String): DataFrame = {
    val oq = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty_dec"))
      .where(col("sum_qty_dec") > 250)
    val ord = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(s, d).select("c_custkey", "c_name")
    oq.join(ord, oq("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("o_orderkey").as("orderkey"), col("o_totalprice").as("totalprice"),
        col("sum_qty_dec").cast("double").as("sum_qty"))
  }

  val q18LargeVolumeCustomersSql: String =
    """WITH oq AS (
      | SELECT l_orderkey AS ok, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      | FROM lineitem GROUP BY 1)
      |SELECT c_custkey AS custkey, c_name AS name, o_orderkey AS orderkey,
      |       o_totalprice AS totalprice, CAST(sum_qty AS DOUBLE) AS sum_qty
      |FROM orders JOIN oq ON o_orderkey = ok JOIN customer ON o_custkey = c_custkey
      |WHERE sum_qty > 250""".stripMargin

  // --- Q19: disjunctive multi-branch predicate (OR-of-ANDs pushdown).

  /** TPC-H Q19-shaped: revenue under three (brand, size, quantity)
    * branches OR-ed together. The disjunction spans both tables, so
    * neither scan could prune on the raw predicate — each side is
    * therefore pre-filtered with the UNION of its per-branch constraints
    * (part: the brand/size disjunction; lineitem: quantity 1–30), which
    * the full predicate implies. Both pre-filters reach the parquet scans
    * as PushedFilters; the exact disjunction then runs post-join on the
    * surviving rows. At 100 TB this is the difference between scanning
    * ~3 brands' parts and scanning all of them.
    */
  def q19DisjunctiveRevenue(s: SparkSession, d: String): DataFrame = {
    val branch1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
      col("l_quantity").between(1, 11)
    val branch2 = col("p_brand") === "Brand#23" && col("p_size").between(10, 30) &&
      col("l_quantity").between(10, 20)
    val branch3 = col("p_brand") === "Brand#34" && col("p_size").between(20, 50) &&
      col("l_quantity").between(20, 30)
    val partsF = Tables.part(s, d)
      .where((col("p_brand") === "Brand#12" && col("p_size").between(1, 15)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(10, 30)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(20, 50)))
      .select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(s, d)
      .where(col("l_quantity").between(1, 30))
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    li.join(partsF, li("l_partkey") === partsF("p_partkey"))
      .where(branch1 || branch2 || branch3)
      .agg(sum(revenue).cast("double").as("revenue"), count(lit(1)).as("n"))
  }

  val q19DisjunctiveRevenueSql: String =
    """SELECT
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      | COUNT(*) AS n
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // --- Q20: suppliers with an outsized share of a part family's volume
  // (nested HAVING against a global scalar).

  /** Shared Spark/DuckDB text. The >0.5%-of-total test is
    * `supplier_sum * 200 > total` (exact multiplication, no division).
    * Catalyst plans the IN as a LEFT SEMI join against the per-supplier
    * aggregate and the total as a ScalarSubquery — both over the
    * 'red'-family slice, which the part filter prunes before any
    * aggregation.
    */
  val q20VolumeShareSuppliersSql: String =
    """SELECT s_suppkey AS suppkey, s_name AS name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_2' AND s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%red%'
      |  GROUP BY l_suppkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) * 200 > (
      |     SELECT SUM(CAST(l_quantity AS DECIMAL(18,2)))
      |     FROM lineitem JOIN part ON l_partkey = p_partkey
      |     WHERE p_name LIKE '%red%'))""".stripMargin

  /** TPC-H Q20-shaped via the SQL front door (see
    * [[q20VolumeShareSuppliersSql]]).
    */
  def q20VolumeShareSuppliers(s: SparkSession, d: String): DataFrame =
    graft.GraftCatalog.sql(s, d, q20VolumeShareSuppliersSql,
      Seq("lineitem", "part", "supplier", "nation"))

  // --- Q21: the supplier who shipped LAST in multi-supplier orders
  // (EXISTS + NOT EXISTS self-joins).

  /** TPC-H Q21-shaped: per supplier, the number of finalized
    * multi-supplier orders where that supplier was the (tied-)latest to
    * ship — Q21's "kept orders waiting" with ship dates standing in for
    * the missing commit/receipt dates. Physical shape: a LEFT SEMI
    * self-join (another supplier exists in the order) then a LEFT ANTI
    * self-join (nobody shipped strictly later), both keyed on orderkey —
    * the same key, so all three branches share one exchange layout and at
    * 100 TB an orderkey-bucketed lineitem runs them shuffle-free.
    * COUNT(DISTINCT orderkey) because a supplier can have several lines in
    * one order.
    */
  def q21WaitingSuppliers(s: SparkSession, d: String): DataFrame = {
    val ordF = Tables.orders(s, d).where(col("o_orderstatus") === "F").select("o_orderkey")
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
    val l = li.join(ordF, li("l_orderkey") === ordF("o_orderkey"))
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val l1 = l.as("l1")
    val l2 = l.as("l2")
    val l3 = l.as("l3")
    val waited = l1
      .join(l2,
        col("l1.l_orderkey") === col("l2.l_orderkey") &&
          col("l1.l_suppkey") =!= col("l2.l_suppkey"),
        "left_semi")
      .join(l3,
        col("l1.l_orderkey") === col("l3.l_orderkey") &&
          col("l1.l_suppkey") =!= col("l3.l_suppkey") &&
          col("l3.l_shipdate") > col("l1.l_shipdate"),
        "left_anti")
    val supp = Tables.supplier(s, d).select("s_suppkey", "s_name")
    waited.join(supp, col("l1.l_suppkey") === supp("s_suppkey"))
      .groupBy(col("s_name").as("name"))
      .agg(countDistinct(col("l1.l_orderkey")).as("numwait"))
  }

  val q21WaitingSuppliersSql: String =
    """WITH l AS (
      | SELECT l_orderkey, l_suppkey, l_shipdate
      | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      | WHERE o_orderstatus = 'F')
      |SELECT s_name AS name, COUNT(DISTINCT l1.l_orderkey) AS numwait
      |FROM l l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE EXISTS (SELECT 1 FROM l l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM l l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY 1""".stripMargin

  // --- Q22: dormant high-balance customers (scalar average + anti join).

  /** Shared Spark/DuckDB text. TPC-H's `acctbal > avg(positive acctbal)`
    * is rearranged to `bal * cnt > sum` (exact decimal multiplication —
    * the two engines would round an AVG quotient differently); "no orders
    * for years" is a NOT EXISTS with a date bound, planned as a LEFT ANTI
    * join against the date-pruned orders scan. The sum/count scalars plan
    * as ScalarSubqueries over the nation-filtered pool.
    */
  val q22DormantCustomersSql: String =
    """WITH pool AS (
      | SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      | FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9))
      |SELECT c_nationkey AS nationkey, COUNT(*) AS numcust,
      |       CAST(SUM(bal) AS DOUBLE) AS totacctbal
      |FROM pool
      |WHERE bal * (SELECT COUNT(*) FROM pool WHERE bal > 0)
      |        > (SELECT SUM(bal) FROM pool WHERE bal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY 1""".stripMargin

  /** TPC-H Q22-shaped via the SQL front door (see
    * [[q22DormantCustomersSql]]).
    */
  def q22DormantCustomers(s: SparkSession, d: String): DataFrame =
    graft.GraftCatalog.sql(s, d, q22DormantCustomersSql, Seq("customer", "orders"))
}
