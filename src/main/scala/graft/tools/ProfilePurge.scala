package graft.tools

import graft.core.VectorTable
import org.apache.spark.sql.functions._

/** Prices the claim PLANS.md makes for [[VectorTable.purge]]: cost is
  * proportional to the files the masked rows landed in, never the table.
  * Builds a 1M-row table in ~16 files, then times
  *   (a) purge after masking 50 rows confined to ONE file's rowid range,
  *   (b) purge after masking 50 rows spread across every file,
  *   (c) the old alternative — a full [[VectorTable.compact]] rewrite —
  * and prints the per-case file-rewrite counts. Expect (a) ≪ (c) and
  * (a) < (b), with (a)'s rewrite count = 1.
  *
  * sbt "runMain graft.tools.ProfilePurge"
  */
object ProfilePurge {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("profile-purge", "32")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PURGE $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def build(tag: String): VectorTable = {
      val root = java.nio.file.Files.createTempDirectory(s"purgeprof-$tag").toString
      val t = VectorTable.create(spark, root)
      val df = spark.range(1000000L)
        .select(col("id").as("k"), md5(col("id").cast("string")).as("v"))
      // two appends so compact() has multiple batches to merge (its no-op
      // guard is batch count, and the comparison must actually rewrite)
      t.append(df.where(col("k") < 500000L), targetRowsPerFile = 64000L)
      t.append(df.where(col("k") >= 500000L), targetRowsPerFile = 64000L)
      t
    }

    // files referenced by the CURRENT manifest (old dirs linger for time
    // travel until vacuum and must not be counted)
    def liveFiles(t: VectorTable): Long =
      t.manifest.batches.map { b =>
        graft.core.DirectParquetRead.partFiles(s"${t.root}/${b.relPath}").size.toLong
      }.sum

    // JIT/codegen warmup through the whole purge path
    val w = build("warm")
    w.deleteWhere(col("k") === 7L)
    w.purge()

    // (a) localized takedown: 50 victims inside one file's rowid range
    val ta = build("local")
    val fa = liveFiles(ta)
    ta.deleteWhere(col("k") >= 1000L && col("k") < 1050L)
    timed(s"purge_50_rows_one_file_of_$fa")(ta.purge())
    println(s"PURGE live_files_after_localized      ${liveFiles(ta)}")

    // (b) scattered takedown: 50 victims spread over every file
    val tb = build("spread")
    tb.deleteWhere(col("k") % 20000L === 0L)
    timed("purge_50_rows_all_files")(tb.purge())

    // (c) the O(table) alternative purge replaces in the maintenance loop
    val tc = build("full")
    tc.deleteWhere(col("k") >= 1000L && col("k") < 1050L)
    timed("full_compact_rewrite")(tc.compact())

    spark.stop()
  }
}
