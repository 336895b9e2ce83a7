package graft.tools

import graft.core.{Tables, VectorTable}
import graft.operators.{IndexCompaction, LshIndex}
import org.apache.spark.sql.functions._

/** Round-17 pricing probe for O(affected) takedown-propagation discovery
  * (round-16 verdict #1): affected-file discovery must not scale with
  * INDEX size. Builds an [[LshIndex]] over 1× and 8× corpora (id-offset
  * replicas, multiple refresh spans so the layout holds many files),
  * takes down the SAME-sized victim set, and times:
  *
  *   - `span_discovery`: the production path — driver-side footer key
  *     spans joined against the mask ([[IndexCompaction.affectedFilesBySpan]]);
  *   - `fullscan_discovery`: the pre-round-17 shape for contrast — a full
  *     index read through an `input_file_name` semi-join;
  *   - `refresh_total`: the whole delete propagation (discovery + the
  *     affected-file rewrite + hard-links + publish).
  *
  * Expect span_discovery to stay ~flat 1×→8× (footer reads are per-file
  * metadata, and victims land in the same number of files) while
  * fullscan_discovery grows with the index. Output: one JSON line per
  * scale.
  */
object ProfileTakedownDiscovery {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("graft-profile-takedown-discovery")
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val maxId = docs.agg(max("doc_id")).head.getLong(0)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // first element is a JIT/codegen warmup: built, measured, not printed
    Seq(-1, 1, 8, 32).foreach { repsIn =>
      val warmup = repsIn < 0
      val reps = math.abs(repsIn)
      val dir = java.nio.file.Files.createTempDirectory(s"graft-tdisc-$reps").toString
      val corpus = (0 until reps).map { r =>
        docs.select((col("doc_id") + lit(r * (maxId + 1))).as("doc_id"), col("text"))
      }.reduce(_ unionAll _)
      val t = VectorTable.create(spark, s"$dir/t")
      // 4 spans -> 4+ index files, the multi-span layout discovery prunes
      val quarter = (maxId + 1) * reps / 4
      var idx: LshIndex = null
      (0 until 4).foreach { qi =>
        t.append(corpus.where(col("doc_id") >= qi * quarter &&
          (col("doc_id") < (qi + 1) * quarter || lit(qi == 3))))
        idx = if (idx == null) LshIndex.build(t, s"$dir/lsh") else idx.refresh(t)
      }
      val files = IndexCompaction.liveFileCount(s"$dir/lsh")
      val rows = idx.bands.count()

      // fixed-size victim set from the FIRST span only
      val victims = (0L until 10L).toSeq
      require(t.deleteWhere(col("doc_id").isInCollection(victims)) == 10L)
      val deleted = t.maskedScan().select(col(VectorTable.ROWID)).localCheckpoint()

      val liveFiles = {
        val d = IndexCompaction.dataDir(s"$dir/lsh")
        val walk = java.nio.file.Files.walk(d)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala
            .filter(p => p.getFileName.toString.endsWith(".parquet")).toVector
        } finally walk.close()
      }
      var affectedSpan: Seq[String] = Nil
      val spanS = timed {
        affectedSpan = IndexCompaction.affectedFilesBySpan(
          spark, liveFiles, VectorTable.ROWID, deleted)
      }
      var affectedFull = 0L
      val fullS = timed {
        affectedFull = idx.bands.withColumn("__f", input_file_name())
          .join(deleted, Seq(VectorTable.ROWID), "left_semi")
          .select("__f").distinct().count()
      }
      val refreshS = timed { idx = idx.refresh(t) }
      require(idx.bands.where(col("doc_id") < 10).count() == 0L)
      if (!warmup) println(s"""{"probe":"takedown_discovery","reps":$reps,"index_rows":$rows,""" +
        s""""index_files":$files,"affected_span":${affectedSpan.size},""" +
        s""""affected_fullscan":$affectedFull,"span_discovery_s":$spanS,""" +
        s""""fullscan_discovery_s":$fullS,"refresh_total_s":$refreshS}""")
    }
    spark.stop()
  }
}
