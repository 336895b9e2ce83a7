package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class EvoV1(id: Long, v: String)
case class EvoV2(id: Long, v: String, extra: Option[Double])

/** Schema evolution policy: additive nullable columns only. Earlier batches
  * surface new columns as NULL through a merged-schema scan; drops, retypes,
  * and non-nullable additions are rejected at append time; compaction
  * unifies the layout and clears the merged-read flag.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("additive nullable column: old rows read as NULL, new rows carry values") {
    val root = tmpDir("evo")
    val s1 = VectorStore.create[EvoV1](spark, root)
    s1.pushx((0 until 100).map(i => EvoV1(i.toLong, s"v$i")))
    val s2 = VectorStore.open[EvoV2](spark, root)
    s2.pushx((100 until 150).map(i => EvoV2(i.toLong, s"v$i", Some(i * 0.5))))

    val m = s2.table.manifest
    assert(m.mixedSchema)
    assert(m.schemaJson.contains("extra"))

    val scan = s2.table.scan()
    assert(scan.columns.contains("extra"))
    assert(scan.count() == 150)
    assert(scan.where(col("extra").isNull).count() == 100)

    // typed reads through the wider type: old rows -> None, new rows -> Some
    assert(s2.get(5L).contains(EvoV2(5L, "v5", None)))
    assert(s2.get(120L).contains(EvoV2(120L, "v120", Some(60.0))))
    // range read straddling the schema boundary
    val straddle = s2.pullx(95L, 10L)
    assert(straddle.map(_.extra).count(_.isEmpty) == 5)
    assert(straddle.map(_.extra).count(_.isDefined) == 5)
  }

  test("drops, retypes, and non-nullable additions are rejected") {
    val root = tmpDir("evo-reject")
    val s1 = VectorStore.create[EvoV1](spark, root)
    s1.pushx(Seq(EvoV1(0L, "a")))
    val t = s1.table
    intercept[IllegalArgumentException] { // dropped column v
      t.append(Seq(1L).toDF("id"))
    }
    intercept[IllegalArgumentException] { // v retyped to long
      t.append(Seq((1L, 2L)).toDF("id", "v"))
    }
    intercept[IllegalArgumentException] { // non-nullable addition
      t.append(Seq((1L, "b")).toDF("id", "v").withColumn("extra", lit(1.0)))
    }
    assert(t.length == 1L) // nothing committed by the rejected appends
  }

  test("compaction unifies evolved batches and clears the merged-read flag") {
    val root = tmpDir("evo-compact")
    val s1 = VectorStore.create[EvoV1](spark, root)
    s1.pushx((0 until 50).map(i => EvoV1(i.toLong, s"v$i")))
    val s2 = VectorStore.open[EvoV2](spark, root)
    s2.pushx((50 until 80).map(i => EvoV2(i.toLong, s"v$i", Some(i * 1.0))))
    assert(s2.table.manifest.mixedSchema)
    s2.table.compact()
    val m = s2.table.manifest
    assert(!m.mixedSchema && m.batches.size == 1)
    assert(s2.get(10L).contains(EvoV2(10L, "v10", None)))
    assert(s2.get(60L).contains(EvoV2(60L, "v60", Some(60.0))))
    assert(s2.table.scan().count() == 80)
  }
}
