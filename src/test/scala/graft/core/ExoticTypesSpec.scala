package graft.core

import graft.SparkSpec
import java.sql.Timestamp

/** Full type-surface round-trip through the store — the reference's
  * supported-type table (SURVEY.md §1.3: ints, bool, UTF-8 strings incl.
  * CJK, Option, Vec<numeric>, fixed binary hashes, timestamps, nested
  * structs, maps) must survive append → parquet → typed read unchanged.
  * Mirrors the reference's mix_data_test / sample_data_test shapes.
  */
case class ENested(a: Int, b: String)
case class ERec(
    id: Long,
    u8: Byte,
    i16: Short,
    i32: Int,
    flag: Boolean,
    s: String,
    optS: Option[String],
    nums: Seq[Long],
    floats: Seq[Double],
    hash: Array[Byte],
    ts: Timestamp,
    nested: ENested,
    tags: Map[String, Long])

class ExoticTypesSpec extends SparkSpec {

  private def sample(i: Int): ERec = ERec(
    id = i.toLong,
    u8 = (i % 127).toByte,
    i16 = (i % 32000).toShort,
    i32 = i * 7,
    flag = i % 2 == 0,
    s = s"文字列-$i-κόσμος",          // CJK + Greek, like sample_data_test's CJK literal
    optS = if (i % 3 == 0) None else Some(s"opt$i"),
    nums = Seq(i.toLong, i * 2L, i * 3L),
    floats = Seq(i * 0.5, i * 1.5),
    hash = Array.tabulate(32)(j => ((i + j) % 256).toByte), // [u8;32] à la sha256
    ts = new Timestamp(1700000000000L + i * 1000L),
    nested = ENested(i, s"n$i"),
    tags = Map("k1" -> i.toLong, "k2" -> (i * 10).toLong))

  test("all reference types round-trip exactly (incl. CJK, Option, binary)") {
    import spark.implicits._
    val store = VectorStore.create[ERec](spark, tmpDir("exotic"))
    val data = (0 until 50).map(sample)
    store.pushx(data)
    val back = store.getall().get
    assert(back.size == 50)
    back.zip(data).foreach { case (b, a) =>
      assert(b.id == a.id && b.u8 == a.u8 && b.i16 == a.i16 && b.i32 == a.i32)
      assert(b.flag == a.flag && b.s == a.s && b.optS == a.optS)
      assert(b.nums == a.nums && b.floats == a.floats)
      assert(b.hash.toSeq == a.hash.toSeq)
      assert(b.ts == a.ts)
      assert(b.nested == a.nested && b.tags == a.tags)
    }
  }

  test("schema classifies as dynamic (has strings/arrays/maps)") {
    import spark.implicits._
    val enc = implicitly[org.apache.spark.sql.Encoder[ERec]]
    assert(SchemaIntrospect.isDynamicStructure(enc.schema))
    // nested contains a String member → classified dynamic, like the
    // derive macro's type-driven rule
    assert(SchemaIntrospect.staticFields(enc.schema)
      .toSet == Set("id", "u8", "i16", "i32", "flag", "ts"))
  }

  test("point read of an exotic record matches") {
    import spark.implicits._
    val store = VectorStore.create[ERec](spark, tmpDir("exotic2"))
    store.pushx((0 until 10).map(sample))
    val r = store.pull(7)
    assert(r == sample(7).copy(hash = r.hash)) // Array equality is by ref
    assert(r.hash.toSeq == sample(7).hash.toSeq)
  }
}
