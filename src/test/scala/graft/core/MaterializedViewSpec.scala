package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental view maintenance: refresh-from-change-feed must be
  * bit-identical to a from-scratch rebuild at every table version, a
  * crash-interrupted refresh must leave the previous state authoritative,
  * and a no-op refresh must not write a new state.
  */
class MaterializedViewSpec extends SparkSpec {

  private def mkTable(root: String, batches: Seq[Seq[(String, Double)]]): VectorTable = {
    import spark.implicits._
    val t = VectorTable.create(spark, root)
    batches.foreach(b => t.append(b.toDF("k", "v")))
    t
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("refresh over appended batches equals from-scratch rebuild") {
    val root = tmpDir("mv")
    val t = mkTable(s"$root/t", Seq(
      Seq("a" -> 1.0, "b" -> 2.5, "a" -> 3.0),
      Seq("b" -> 0.5, "c" -> 9.0),
      Seq("a" -> -1.0, "c" -> 4.25, "d" -> 0.0)))
    // build at v1 (reopen a same-rooted table frozen earlier is not needed:
    // build aggregates the head, which at this point is all three appends)
    val v = MaterializedAggView.build(t, s"$root/v1", Seq("k"), Seq("v"))
    val rebuilt = t.scan().groupBy("k").agg(
      count(lit(1)).as("n_rows"),
      sum(col("v").cast("decimal(18,2)")).as("v_sum"),
      min(col("v")).as("v_min"), max(col("v")).as("v_max"))
    assert(canon(v.read()) == canon(rebuilt))
  }

  test("incremental refresh across two appends matches rebuild, bit-exact") {
    val root = tmpDir("mvinc")
    import spark.implicits._
    val t = VectorTable.create(spark, s"$root/t")
    t.append(Seq("a" -> 1.0, "b" -> 2.5, "a" -> 3.0).toDF("k", "v"))
    val v = MaterializedAggView.build(t, s"$root/view", Seq("k"), Seq("v"))
    assert(v.basisVersion == 1L)
    t.append(Seq("b" -> 0.5, "c" -> 9.0).toDF("k", "v"))
    t.append(Seq("a" -> -1.0, "c" -> 4.25, "d" -> 0.0).toDF("k", "v"))
    v.refresh()
    assert(v.basisVersion == t.versions.max)
    val rebuilt = MaterializedAggView.build(t, s"$root/view2", Seq("k"), Seq("v"))
    assert(canon(v.read()) == canon(rebuilt.read()))
    // groups only in the delta (c, d) and only in the base (none here) both
    // survive the full-outer merge
    assert(v.read().where(col("k") === "d").count() == 1)
  }

  test("no-op refresh keeps state dir; reopen restores definition") {
    val root = tmpDir("mvnoop")
    import spark.implicits._
    val t = VectorTable.create(spark, s"$root/t")
    t.append(Seq("x" -> 1.0).toDF("k", "v"))
    val v = MaterializedAggView.build(t, s"$root/view", Seq("k"), Seq("v"))
    val before = v.basisVersion
    v.refresh() // table unchanged
    assert(v.basisVersion == before)
    val reopened = MaterializedAggView.open(t, s"$root/view")
    assert(reopened.keyCols == Seq("k") && reopened.valCols == Seq("v"))
    assert(canon(reopened.read()) == canon(v.read()))
  }

  test("refresh after restore-and-regrow refuses (never diverges); rebuild recovers") {
    val root = tmpDir("mvrestore")
    import spark.implicits._
    val t = VectorTable.create(spark, s"$root/t")
    t.append(Seq("a" -> 1.0, "b" -> 2.0).toDF("k", "v"))            // v1, rows [0,2)
    t.append(Seq("a" -> 10.0, "c" -> 20.0).toDF("k", "v"))          // v2, rows [2,4)
    val v = MaterializedAggView.build(t, s"$root/view", Seq("k"), Seq("v")) // basis v2
    t.restore(1L)                                                    // v3, length back to 2
    // regrow PAST the basis length with different content on reused rowids
    t.append(Seq("z" -> 100.0, "z" -> 200.0, "z" -> 300.0).toDF("k", "v")) // v4, rows [2,5)
    assert(t.lengthAt(t.versions.max) >= 4L) // the old length-only guard would pass here
    val ex = intercept[IllegalArgumentException](v.refresh())
    assert(ex.getMessage.contains("RESTORE"))
    // view state is untouched by the refused refresh
    assert(v.read().where(col("k") === "c").count() == 1)
    v.rebuild()
    val fresh = MaterializedAggView.build(t, s"$root/view2", Seq("k"), Seq("v"))
    assert(canon(v.read()) == canon(fresh.read()))
    assert(v.read().where(col("k") === "c").count() == 0) // dropped rows really gone
  }

  test("refresh keeps DECIMAL(28,2) sums exact past 10^16 (no narrowing overflow)") {
    val root = tmpDir("mvbig")
    import spark.implicits._
    // each value fits DECIMAL(18,2); the group SUM does not — only the
    // (28,2) accumulator carries it through a refresh un-NULLed
    val big = 9.0e15
    val t = VectorTable.create(spark, s"$root/t")
    t.append(Seq("g" -> big, "g" -> big).toDF("k", "v"))
    val v = MaterializedAggView.build(t, s"$root/view", Seq("k"), Seq("v"))
    t.append(Seq("g" -> big, "g" -> big).toDF("k", "v"))
    v.refresh()
    val sum = v.read().select(col("v_sum")).head.getDecimal(0)
    assert(sum != null, "sum must not overflow to NULL on refresh")
    assert(sum == new java.math.BigDecimal("36000000000000000.00"))
    val rebuilt = MaterializedAggView.build(t, s"$root/view2", Seq("k"), Seq("v"))
    assert(canon(v.read()) == canon(rebuilt.read()))
  }

  test("orphaned state dir from a crashed refresh is ignored") {
    val root = tmpDir("mvcrash")
    import spark.implicits._
    val t = VectorTable.create(spark, s"$root/t")
    t.append(Seq("x" -> 1.0).toDF("k", "v"))
    val v = MaterializedAggView.build(t, s"$root/view", Seq("k"), Seq("v"))
    val good = canon(v.read())
    // simulate a crash AFTER writing a new state dir but BEFORE the CURRENT
    // pointer move: the extra dir must not be picked up
    spark.range(1).selectExpr("'zz' AS k", "CAST(1 AS LONG) AS n_rows",
      "CAST(1.0 AS DECIMAL(18,2)) AS v_sum", "1.0 AS v_min", "1.0 AS v_max")
      .write.parquet(s"$root/view/state-v000000000099")
    assert(canon(MaterializedAggView.open(t, s"$root/view").read()) == good)
  }
}
