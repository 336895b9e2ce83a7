package graft.core

import graft.SparkSpec
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import scala.jdk.CollectionConverters._

case class LFixed(a: Long, b: Double, c: Int)
case class LDyn(a: Long, s: String)

/** The static/dynamic layout classification is load-bearing in the writer
  * (reference static_vector_manage_service.rs:96-123 fast path): all-fixed-
  * width batches are written with dictionary encoding off (PLAIN pages,
  * stride-decodable), variable-width batches keep dictionary encoding, and
  * the manifest records the choice.
  */
class LayoutEncodingSpec extends SparkSpec {
  import spark.implicits._

  /** Every encoding used by any data column chunk across the batch's files. */
  private def encodings(table: VectorTable): Set[String] = {
    val conf = new Configuration()
    table.manifest.batches.flatMap { b =>
      DirectParquetRead.partFiles(s"${table.root}/${b.relPath}").flatMap { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(new HPath(f), conf))
        try r.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .flatMap(_.getEncodings.asScala.map(_.name()))
        finally r.close()
      }
    }.toSet
  }

  test("static layout writes plain (no dictionary pages), recorded in the manifest") {
    val store = VectorStore.create[LFixed](spark, tmpDir("layout-static"))
    // low-cardinality values: dictionary WOULD engage if it were enabled
    store.pushx((0 until 5000).map(i => LFixed(i % 7L, (i % 3).toDouble, i % 5)))
    val m = store.table.manifest
    assert(m.layout == "static")
    assert(m.encoding == "plain")
    val encs = encodings(store.table)
    assert(!encs.exists(_.contains("DICTIONARY")), s"dictionary pages present: $encs")
    // reads are unaffected by the encoding choice
    assert(store.get(42L).contains(LFixed(42 % 7L, 0.0, 2)))
    assert(store.pullx(0, 5000).size == 5000)
  }

  test("dynamic layout keeps dictionary encoding where it earns its keep") {
    val store = VectorStore.create[LDyn](spark, tmpDir("layout-dyn"))
    store.pushx((0 until 5000).map(i => LDyn(i.toLong, s"repeated-${i % 4}")))
    val m = store.table.manifest
    assert(m.layout == "dynamic")
    assert(m.encoding == "dictionary")
    assert(encodings(store.table).exists(_.contains("DICTIONARY")))
  }

  test("compaction preserves the encoding choice") {
    val store = VectorStore.create[LFixed](spark, tmpDir("layout-compact"))
    store.pushx((0 until 100).map(i => LFixed(i.toLong, i * 0.5, i)))
    store.pushx((100 until 200).map(i => LFixed(i.toLong, i * 0.5, i)))
    store.table.compact()
    val m = store.table.manifest
    assert(m.batches.size == 1 && m.encoding == "plain")
    assert(!encodings(store.table).exists(_.contains("DICTIONARY")))
    assert(store.get(150L).contains(LFixed(150L, 75.0, 150)))
  }

  test("pre-encoding manifests parse with the dictionary default") {
    val m = Manifest.parse("version=3\nlength=10\nlayout=static\nbatch=3,0,10,data/batch-00000003\n")
    assert(m.encoding == "dictionary")
  }
}
