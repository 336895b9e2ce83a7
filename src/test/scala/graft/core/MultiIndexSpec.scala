package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class MiRec(region: Long, status: String, amount: Long, tag: String)

/** Composite secondary index: prefix lookups, prefix+range lookups,
  * incremental refresh, metadata round-trip — always equivalent to a full
  * scan + filter.
  */
class MultiIndexSpec extends SparkSpec {

  private def mkRows(lo: Int, hi: Int): Seq[MiRec] =
    (lo until hi).map(i => MiRec(i % 5L, if (i % 3 == 0) "open" else "closed", i.toLong, s"t$i"))

  private def expected(t: VectorTable, pred: org.apache.spark.sql.Column): Set[Long] =
    t.scan().where(pred).select(VectorTable.ROWID).collect().map(_.getLong(0)).toSet

  test("prefix and full-key lookups match scan+filter; refresh is incremental") {
    import spark.implicits._
    val root = tmpDir("mi")
    val t = VectorTable.create(spark, s"$root/table")
    t.append(mkRows(0, 300).toDF())
    val idx = MultiIndex.build(t, Seq("region", "status"), s"$root/index")

    assert(idx.lookup(Seq(2L, "open")).toSet == expected(t, col("region") === 2 && col("status") === "open"))
    assert(idx.lookup(Seq(2L)).toSet == expected(t, col("region") === 2))

    t.append(mkRows(300, 400).toDF())
    assert(idx.isStale(t))
    val idx2 = idx.refresh(t)
    assert(!idx2.isStale(t))
    assert(idx2.lookup(Seq(2L, "open")).toSet ==
      expected(t, col("region") === 2 && col("status") === "open"))
    // new rows (rowid >= 300) are found
    assert(idx2.lookup(Seq(2L)).exists(_ >= 300L))
  }

  test("prefix equality + range on the next key column") {
    import spark.implicits._
    val root = tmpDir("mi2")
    val t = VectorTable.create(spark, s"$root/table")
    t.append(mkRows(0, 200).toDF())
    val idx = MultiIndex.build(t, Seq("status", "amount"), s"$root/index")
    val got = idx.lookupPrefixRange(Seq("open"), 30L, 90L).toSet
    assert(got == expected(t, col("status") === "open" && col("amount").between(30, 90)))
    assert(got.nonEmpty)
  }

  test("open() restores key columns and serves lookups") {
    import spark.implicits._
    val root = tmpDir("mi3")
    val t = VectorTable.create(spark, s"$root/table")
    t.append(mkRows(0, 100).toDF())
    MultiIndex.build(t, Seq("region", "status"), s"$root/index")
    val reopened = MultiIndex.open(spark, s"$root/index")
    assert(reopened.keyCols == Seq("region", "status"))
    assert(reopened.lookup(Seq(1L, "closed")).toSet ==
      expected(t, col("region") === 1 && col("status") === "closed"))
  }
}
