package graft.tools

import org.apache.spark.sql.functions._

/** Price the IVF compaction op: build a deliberately fragmented index
  * (N span refreshes → N files per cell), time the multiprobe search on
  * it, compact (timed), time the same searches again, and print the
  * file-count and latency deltas. The numbers land in PLANS.md as the
  * measured claim behind `IvfTableIndex.compact()`.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ProfileCompaction [sfDir] [spans]"
  */
object ProfileCompaction {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spans = if (args.length > 1) args(1).toInt else 8
    val spark = graft.core.GraftSession.local("profile-compaction")
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("profile-compaction").toString

    val emb = graft.core.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
    val maxId = emb.agg(max("vec_id")).head.getLong(0)
    val t = graft.core.VectorTable.create(spark, s"$dir/table")
    val tBuild0 = System.nanoTime()
    t.append(emb.where(col("vec_id") < (maxId + 1) / spans))
    var idx = graft.operators.IvfTableIndex.build(t, s"$dir/index", numCells = 32)
    (1 until spans).foreach { i =>
      val lo = (maxId + 1) * i / spans
      val hi = (maxId + 1) * (i + 1) / spans
      t.append(emb.where(col("vec_id") >= lo && col("vec_id") < hi))
      idx = idx.refresh(t)
    }
    println(f"PROFILE span_build_${spans}x      ${(System.nanoTime() - tBuild0) / 1e9}%.3f s")

    val queries = emb.where(col("vec_id") % 97 === 5).limit(20)
      .collect().map(_.getSeq[Float](1).toArray)
    def searchAll(): Double = {
      val t0 = System.nanoTime()
      queries.foreach(q => idx.search(q, 5, 2).collect())
      (System.nanoTime() - t0) / 1e9
    }
    searchAll() // warm codegen/JIT once
    val frag = idx.filesPerCell()
    println(f"PROFILE files_per_cell_frag   max=${frag.values.max} total=${frag.values.sum}")
    val fragTimes = (1 to 3).map(_ => searchAll())
    println(f"PROFILE search20_fragmented   ${fragTimes.min}%.3f s (min of 3)")

    val tc = System.nanoTime()
    idx.compact()
    println(f"PROFILE compact               ${(System.nanoTime() - tc) / 1e9}%.3f s")
    val comp = idx.filesPerCell()
    println(f"PROFILE files_per_cell_comp   max=${comp.values.max} total=${comp.values.sum}")
    val compTimes = (1 to 3).map(_ => searchAll())
    println(f"PROFILE search20_compacted    ${compTimes.min}%.3f s (min of 3)")
    spark.stop()
  }
}
