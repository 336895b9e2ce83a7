package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two or more
  * columns' rank-space values and range-partition + sort files by the
  * interleaved key. Every parquet file then covers a compact HYPER-RECTANGLE
  * of the key space instead of a slab along one axis, so min/max stats
  * prune multi-dimensional range predicates on EVERY clustered column —
  * a single-column sort only ever prunes its own column.
  *
  * At 100 TB this is the difference between "a (tenant, time) query reads
  * the few files whose rectangle intersects it" and "it reads every file
  * because the layout only sorted by tenant". The same curve discipline
  * underlies clustered layouts in lakehouse table formats; implemented
  * here from the curve definition with pure column arithmetic (shifts and
  * masks), so the whole z-value computation stays inside whole-stage
  * codegen — no UDF.
  *
  * The layout step is an offline job (one stats pass + one range shuffle);
  * readers are plain `spark.read.parquet` + filters and rely on parquet
  * row-group pruning, nothing custom.
  */
object ZOrder {

  /** Bits of rank-space resolution per column (16 → up to 4 columns in a
    * 64-bit z-value).
    */
  val BitsPerCol = 16

  /** Spread a 16-bit value's bits 2 apart ("morton spread") with the
    * classic mask ladder — 4 shift+or+mask rounds, all codegen'd.
    */
  private def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** Generalized spread: bits `n` apart for an n-column interleave. n=2
    * uses the fast mask ladder; 3-4 fall back to a per-bit ladder (still
    * plain column ops, and layout jobs run offline).
    */
  private def spread(c: Column, n: Int): Column =
    if (n <= 1) c.bitwiseAND(lit(0xFFFFL))
    else if (n == 2) spread16(c)
    else {
      val x = c.bitwiseAND(lit(0xFFFFL))
      (0 until BitsPerCol).map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * n)
      }.reduce(_.bitwiseOR(_))
    }

  /** Map `c` to a 16-bit rank via linear scaling over [min, max]. Nulls map
    * to rank 0 (they sort together, harmless for layout).
    */
  private def rank16(c: Column, lo: Double, hi: Double): Column = {
    val span = if (hi > lo) hi - lo else 1.0
    val scaled = ((c.cast("double") - lit(lo)) / lit(span) * lit(65535.0)).cast("long")
    coalesce(greatest(least(scaled, lit(65535L)), lit(0L)), lit(0L))
  }

  /** The z-value column for `cols`, scaling each by the provided
    * (min, max). All arithmetic is plain column ops — codegen'd, no UDF.
    */
  def zvalue(cols: Seq[Column], bounds: Seq[(Double, Double)]): Column = {
    require(cols.size >= 2 && cols.size <= 4, "z-order interleaves 2-4 columns")
    require(bounds.size == cols.size)
    cols.zip(bounds).zipWithIndex.map { case ((c, (lo, hi)), i) =>
      shiftleft(spread(rank16(c, lo, hi), cols.size), i)
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` z-ordered by `cols` into `path` as `numFiles` files: one
    * stats pass for the per-column bounds, one range shuffle on the
    * z-value, a within-partition sort, then a plain parquet write (the
    * z-value itself is dropped — it is a layout device, not data).
    */
  def write(df: DataFrame, cols: Seq[String], path: String, numFiles: Int): Unit = {
    val aggs = cols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val bounds = cols.indices.map(i => (row.getDouble(2 * i), row.getDouble(2 * i + 1)))
    val z = zvalue(cols.map(col), bounds)
    df.withColumn("_zorder", z)
      .repartitionByRange(numFiles, col("_zorder"))
      .sortWithinPartitions("_zorder")
      .drop("_zorder")
      .write.mode("errorifexists").parquet(path)
  }
}
