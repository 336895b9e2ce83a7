package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** A committed batch of rows covering the dense rowid range [start, end). */
final case class BatchInfo(id: Long, start: Long, end: Long, relPath: String)

/** Table manifest — the Spark analog of the reference's 8-byte length
  * header + length-mutex reservation (reference:
  * src/services/dynamic_vector_manage_service.rs:56-85, :291-298).
  *
  * One small text file per committed version under `_graft/`; commit is an
  * atomic create-if-absent of the next version file (optimistic, serialized
  * — the reference is likewise single-writer-serialized through its mutex).
  * `length` is readable in O(1) without touching data files, exactly like
  * the reference's header read (dynamic_vector_manage_service.rs:72-79).
  */
final case class Manifest(version: Long, length: Long, layout: String, batches: Vector[BatchInfo]) {
  def serialize: String = {
    val header = Seq(s"version=$version", s"length=$length", s"layout=$layout")
    val lines = batches.map(b => s"batch=${b.id},${b.start},${b.end},${b.relPath}")
    (header ++ lines).mkString("\n") + "\n"
  }
}

object Manifest {
  private val FilePattern = "manifest-v(\\d{12})\\.txt".r

  def metaDir(root: String): Path = Paths.get(root, "_graft")

  def parse(text: String): Manifest = {
    val kv = text.linesIterator.filter(_.nonEmpty).toVector
    def field(k: String): String =
      kv.collectFirst { case l if l.startsWith(k + "=") => l.drop(k.length + 1) }
        .getOrElse(throw new IllegalStateException(s"manifest missing $k"))
    val batches = kv.collect { case l if l.startsWith("batch=") =>
      val Array(id, s, e, p) = l.drop(6).split(",", 4)
      BatchInfo(id.toLong, s.toLong, e.toLong, p)
    }
    Manifest(field("version").toLong, field("length").toLong, field("layout"), batches)
  }

  /** Latest committed manifest, or the empty v0 manifest for a new table. */
  def load(root: String): Manifest = {
    val dir = metaDir(root)
    if (!Files.isDirectory(dir)) return Manifest(0L, 0L, "dynamic", Vector.empty)
    val versions = Files.list(dir).iterator().asScala
      .flatMap(p => FilePattern.findFirstMatchIn(p.getFileName.toString).map(_.group(1).toLong))
      .toVector
    if (versions.isEmpty) Manifest(0L, 0L, "dynamic", Vector.empty)
    else parse(Files.readString(dir.resolve(fileName(versions.max))))
  }

  def fileName(version: Long): String = f"manifest-v$version%012d.txt"

  /** Commit `m` as the next version; create-if-absent gives atomicity. */
  def commit(root: String, m: Manifest): Unit = {
    val dir = metaDir(root)
    Files.createDirectories(dir)
    Files.write(
      dir.resolve(fileName(m.version)),
      m.serialize.getBytes("UTF-8"),
      StandardOpenOption.CREATE_NEW
    )
  }
}

/** Parquet-backed, append-only, rowid-addressed table — the reference's
  * `VectorEngine` data model (SURVEY.md §1) re-expressed Spark-first.
  *
  * - Dense `_rowid` (insertion order) is assigned per append batch by
  *   offsetting `zipWithIndex` from the manifest high-water mark; within a
  *   batch, partition boundaries carve contiguous sorted rowid ranges, so
  *   every written parquet file carries tight min/max `_rowid` stats.
  * - Point/range reads prune twice: driver-side on the manifest's per-batch
  *   [start,end) ranges (skips whole batch directories without listing
  *   them), then on parquet row-group stats via the pushed `_rowid` filter.
  *   At 100 TB this means a `pull` touches one file's footer + one row
  *   group, never a full scan.
  * - The static/dynamic layout split (reference
  *   static_vector_manage_service.rs vs dynamic_vector_manage_service.rs)
  *   collapses inside Parquet (fixed-width plain encoding vs offsets+values)
  *   — we keep the *classification* (SchemaIntrospect) and record it in the
  *   manifest for observability.
  */
final class VectorTable(val spark: SparkSession, val root: String) {
  import VectorTable.ROWID

  def manifest: Manifest = Manifest.load(root)

  /** O(1) record count — reference `len()` (src/vector_engine.rs:29). */
  def length: Long = manifest.length

  def isEmpty: Boolean = length == 0L

  /** Bulk append preserving input order — reference `pushx`
    * (src/vector_engine.rs:26). Returns the first assigned rowid.
    * Serialized commits (synchronized + create-if-absent manifest) mirror
    * the reference's locked index reservation.
    */
  def append(df: DataFrame): Long = VectorTable.commitLock.synchronized {
    val m = manifest
    val start = m.length
    val schema = df.schema
    require(!schema.fieldNames.contains(ROWID), s"input must not carry $ROWID")

    // Dense rowid: zipWithIndex assigns contiguous per-partition ranges in
    // partition order (monotonically_increasing_id would leave gaps; a
    // global row_number would funnel through one task — SURVEY.md §7.3).
    val withId = {
      val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq((start + i) +: r.toSeq)
      }
      spark.createDataFrame(rdd, StructType(StructField(ROWID, LongType, nullable = false) +: schema.fields))
    }

    val batchId = m.version + 1
    val rel = f"data/batch-$batchId%08d"
    withId.write.mode("errorifexists").parquet(s"$root/$rel")

    // Row count from parquet footer metadata only (no data scan).
    val n = spark.read.parquet(s"$root/$rel").count()
    val layout = if (SchemaIntrospect.isDynamicStructure(schema)) "dynamic" else "static"
    Manifest.commit(root, Manifest(batchId, start + n, layout,
      m.batches :+ BatchInfo(batchId, start, start + n, rel)))
    start
  }

  /** Full scan carrying `_rowid`; storage order ≡ insertion order. */
  def scan(): DataFrame = {
    val m = manifest
    if (m.batches.isEmpty) emptyLike()
    else spark.read.parquet(m.batches.map(b => s"$root/${b.relPath}"): _*)
  }

  /** Range read [index, index+count) — reference `pullx`/`getx`
    * (src/vector_engine.rs:28,40-46). Driver-side manifest pruning selects
    * only overlapping batches; the rowid predicate then prunes row groups.
    */
  def range(index: Long, count: Long): DataFrame = {
    val m = manifest
    val lo = index
    val hi = index + count
    val hit = m.batches.filter(b => b.end > lo && b.start < hi)
    if (hit.isEmpty) emptyLike()
    else spark.read.parquet(hit.map(b => s"$root/${b.relPath}"): _*)
      .where(col(ROWID) >= lo && col(ROWID) < hi)
  }

  /** Point read — reference `pull`/`get` (src/vector_engine.rs:27,33-39). */
  def point(index: Long): DataFrame = range(index, 1L)

  private def emptyLike(): DataFrame = {
    val m = manifest
    if (m.batches.nonEmpty)
      spark.read.parquet(s"$root/${m.batches.head.relPath}").where(lit(false))
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField(ROWID, LongType, nullable = false))))
  }
}

object VectorTable {
  val ROWID = "_rowid"
  private[core] val commitLock = new Object

  def create(spark: SparkSession, root: String): VectorTable = {
    Files.createDirectories(Paths.get(root))
    new VectorTable(spark, root)
  }

  def open(spark: SparkSession, root: String): VectorTable = new VectorTable(spark, root)
}
