package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Composite (multi-column) secondary index over a [[VectorTable]]: the
  * key tuple is stored sorted lexicographically by the key columns, so the
  * layout behaves like a composite B-tree — parquet min/max stats prune
  * hard on the LEADING column, and within those files on the next, etc.
  * Lookups therefore support the classic composite-index shapes:
  * equality on a key-column prefix, and prefix equality + range on the
  * next column. Resolved rowids feed the store's point-read paths exactly
  * like [[SecondaryIndex]] (whose single-column form this generalizes);
  * incremental refresh appends only the rowid span committed since the
  * index was built.
  */
final class MultiIndex private (
    val spark: SparkSession,
    val root: String,
    val keyCols: Seq[String],
    val builtFromVersion: Long,
    val indexedLength: Long) {

  private lazy val df: DataFrame = spark.read.parquet(s"$root/data")

  private def kcol(i: Int): Column = col(s"k$i")

  /** Rowids matching equality on the first `values.size` key columns (a
    * leading prefix — the only shape the sorted layout serves
    * efficiently, as with any composite index).
    */
  def lookup(values: Seq[Any]): Seq[Long] = {
    require(values.nonEmpty && values.size <= keyCols.size,
      s"lookup takes 1..${keyCols.size} leading key values")
    val pred = values.zipWithIndex.map { case (v, i) => kcol(i) === lit(v) }.reduce(_ && _)
    df.where(pred).select("r").collect().map(_.getLong(0)).toSeq
  }

  /** Prefix equality plus an inclusive range on the NEXT key column. */
  def lookupPrefixRange(prefix: Seq[Any], lo: Any, hi: Any): Seq[Long] = {
    require(prefix.size < keyCols.size, "range column must be within the key")
    val eq = prefix.zipWithIndex.map { case (v, i) => kcol(i) === lit(v) }
    val rc = kcol(prefix.size)
    val pred = (eq :+ (rc >= lit(lo)) :+ (rc <= lit(hi))).reduce(_ && _)
    df.where(pred).select("r").collect().map(_.getLong(0)).toSeq
  }

  /** True iff the table has committed batches past the index build. */
  def isStale(table: VectorTable): Boolean =
    table.manifest.version > builtFromVersion

  /** Index only the appended span; the indexed prefix is immutable and
    * never re-scanned. Returns the refreshed handle (no-op → `this`).
    */
  def refresh(table: VectorTable): MultiIndex = {
    val m = table.manifest
    if (m.length <= indexedLength) return this
    MultiIndex.writeSpan(table, keyCols, indexedLength, m.length - indexedLength, root, append = true)
    MultiIndex.writeMeta(root, keyCols, m.version, m.length)
    new MultiIndex(spark, root, keyCols, m.version, m.length)
  }
}

object MultiIndex {

  /** Build the composite index for `keyCols` under `root`. */
  def build(table: VectorTable, keyCols: Seq[String], root: String): MultiIndex = {
    require(keyCols.nonEmpty)
    val m = table.manifest
    Files.createDirectories(Paths.get(root))
    if (m.length > 0) writeSpan(table, keyCols, 0L, m.length, root, append = false)
    writeMeta(root, keyCols, m.version, m.length)
    new MultiIndex(table.spark, root, keyCols, m.version, m.length)
  }

  /** Open a previously built index (key columns come from the metadata). */
  def open(spark: SparkSession, root: String): MultiIndex = {
    val lines = Files.readString(Paths.get(root, "meta.txt")).trim.linesIterator.toSeq
    val Array(v, len) = lines.head.split(",")
    new MultiIndex(spark, root, lines.tail, v.toLong, len.toLong)
  }

  private def writeSpan(table: VectorTable, keyCols: Seq[String], start: Long,
                        count: Long, root: String, append: Boolean): Unit = {
    val slim = table.range(start, count).select(
      keyCols.zipWithIndex.map { case (c, i) => col(c).as(s"k$i") } :+
        col(VectorTable.ROWID).as("r"): _*)
    val parts = math.max(1, math.min(table.spark.sparkContext.defaultParallelism,
      (count / 4000000L + 1L).toInt))
    slim
      .repartitionByRange(parts, keyCols.indices.map(i => col(s"k$i")): _*)
      .sortWithinPartitions(keyCols.indices.map(i => col(s"k$i")): _*)
      .write.mode(if (append) "append" else "overwrite").parquet(s"$root/data")
  }

  private def writeMeta(root: String, keyCols: Seq[String], version: Long, length: Long): Unit =
    Files.write(Paths.get(root, "meta.txt"),
      (s"$version,$length" +: keyCols).mkString("\n").getBytes("UTF-8"))
}
