package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark harness: every declared query (cold, one-shot, in
  * deterministic name order) plus the reference's own benchmark dimensions
  * (BASELINE.md: bulk append, full scan, contiguous range read, random point
  * reads, concurrent readers) against a scratch VectorTable.
  * Prints ONE JSON line for the driver.
  */
object Bench {

  final case class BenchRec(name: String, n: Long, payload: String)
  /** Array-heavy row mirroring the reference's `DynamicStruct` with a
    * growing `Vec<usize>` (tests/tests/vector_performance_test.rs:8,67-98).
    */
  final case class ArrayRec(id: Long, xs: Seq[Long])
  /** All-fixed-width row mirroring the reference's static-layout 1M bench
    * (30-byte rows, static_vector_manage_service.rs:185,218-240) — takes
    * the PLAIN-encoded static write path (SchemaIntrospect → manifest
    * layout=static, LayoutEncodingSpec).
    */
  final case class FixedRec(a: Long, b: Long, c: Double, d: Boolean)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // Session/JIT warmup — no INPUT table is touched, so scan dimensions
    // stay honest, but the parquet read/write stack, codegen, and window
    // machinery are exercised on a scratch table; without this the
    // alphabetically-first query absorbs >1 s of cold-start that belongs
    // to the session, not the operator.
    spark.range(1000000).selectExpr("sum(id)").head()
    val warmDir = java.nio.file.Files.createTempDirectory("graft-bench-warm").toString + "/t"
    spark.range(10000).selectExpr("id", "CAST(id AS STRING) AS s", "id * 1.5 AS v")
      .write.parquet(warmDir)
    val warm = spark.read.parquet(warmDir)
    warm.where(org.apache.spark.sql.functions.col("id") > 100)
      .groupBy("s").agg(org.apache.spark.sql.functions.sum("v")).count()
    warm.withColumn("rn", org.apache.spark.sql.functions.row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("s").orderBy("id"))).count()

    // One-time table/index builds, timed as their own dimension: the rowid
    // table is built once per machine and reused across runs (the serving
    // query itself must cost a pruned range read, not a rebuild).
    val tRowidBuild = try timed(graft.operators.Relational.prebuildRowidTable(spark, sfDir))
      catch { case _: Throwable => -1.0 }
    val tZoneBuild = try timed(graft.operators.Relational.prebuildZoneTable(spark, sfDir))
      catch { case _: Throwable => -1.0 }
    val tZOrderBuild = try timed(graft.operators.Relational.prebuildZOrderLayout(spark, sfDir))
      catch { case _: Throwable => -1.0 }
    val tLshIndexBuild = try timed(graft.operators.Dedup.prebuildLshIndex(spark, sfDir))
      catch { case _: Throwable => -1.0 }
    val tIvfIndexBuild = try timed(graft.operators.Similarity.ivfIndexFor(spark, sfDir))
      catch { case _: Throwable => -1.0 }
    val tSecIndexBuild = try timed(graft.operators.Relational.prebuildCustkeyIndex(spark, sfDir))
      catch { case _: Throwable => -1.0 }
    val tUpsertBuild = try timed(graft.operators.Relational.prebuildUpsertTable(spark, sfDir))
      catch { case _: Throwable => -1.0 }
    val tMvBuild = try timed(graft.operators.Relational.prebuildPricingSummaryView(spark, sfDir))
      catch { case _: Throwable => -1.0 }

    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> (try timed(fn(spark, sfDir).count()) catch { case _: Throwable => -1.0 })
    } :+ ("rowid_table_build" -> tRowidBuild) :+ ("ivf_index_build" -> tIvfIndexBuild) :+
      ("zonemap_table_build" -> tZoneBuild) :+ ("zorder_layout_build" -> tZOrderBuild) :+
      ("lsh_index_build" -> tLshIndexBuild) :+ ("sec_index_build" -> tSecIndexBuild) :+
      ("upsert_table_build" -> tUpsertBuild) :+ ("mv_view_build" -> tMvBuild)

    // --- store-level dimensions (reference harness workloads, BASELINE.md) ---
    val storeTimes = try {
      import spark.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft-bench").toString
      val store = graft.core.VectorStore.create[BenchRec](spark, root)
      val rows = (0 until 100000).map(i => BenchRec(s"user${i % 97}", i.toLong, s"payload-$i-${"x" * 40}"))
      val tAppend = timed(store.pushx(rows))
      val tScan = timed(store.toDS().agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).head())
      val tRange = timed(assert(store.pullx(50000, 1000).size == 1000))
      val cached = graft.core.ReadCachedStore.over(store)
      val rnd = new scala.util.Random(42)
      val coldIds = Vector.fill(50)(rnd.nextInt(100000).toLong)
      val tPoint = timed(coldIds.foreach(cached.getting))
      // hot phase re-reads the now-cached ids: measures the LRU hit path
      val tPointHot = timed((0 until 1000).foreach(i => cached.getting(coldIds(i % 50))))
      // 10 concurrent reader threads over the warmed cache + live store
      // (reference dimension: cache_performance_test.rs multi-thread reads)
      val tConcurrent = timed {
        val threads = (0 until 10).map { t =>
          new Thread(() => {
            val r = new scala.util.Random(t)
            (0 until 100).foreach { _ =>
              cached.getting(coldIds(r.nextInt(coldIds.size))).getOrElse(sys.error("miss"))
            }
          })
        }
        threads.foreach(_.start())
        threads.foreach(_.join())
      }
      val tBatchedPoints = timed {
        val got = store.getMany(coldIds)
        assert(got.size == coldIds.distinct.size)
      }
      // 1M-row dimensions at the reference harness's own scale
      // (COUNT=1,000,000: tests/tests/sample_data_test.rs:8,
      // cache_engine_performance_test.rs:14) so the comparison holds at
      // equal row counts, not just equal shapes.
      val root1m = java.nio.file.Files.createTempDirectory("graft-bench-1m").toString
      val store1m = graft.core.VectorStore.create[BenchRec](spark, root1m)
      val rows1m = (0 until 1000000).map(i => BenchRec(s"user${i % 97}", i.toLong, s"payload-$i-${"x" * 40}"))
      val tAppend1m = timed(store1m.pushx(rows1m))
      val tScan1m = timed(store1m.toDS().agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).head())
      val tGetall1m = timed(assert(store1m.getall().get.size == 1000000))
      // array-heavy rows at the reference harness scale (COUNT=10,000,
      // growing list field — vector_performance_test.rs:8,67-98)
      val rootArr = java.nio.file.Files.createTempDirectory("graft-bench-arr").toString
      val storeArr = graft.core.VectorStore.create[ArrayRec](spark, rootArr)
      val arrRows = (0 until 10000).map(i => ArrayRec(i.toLong, (0L to (i % 100).toLong)))
      val tArrAppend = timed(storeArr.pushx(arrRows))
      val tArrRead = timed(assert(storeArr.getall().get.size == 10000))
      // static-layout 1M (reference static_vector_manage_service 1M bench)
      val rootFix = java.nio.file.Files.createTempDirectory("graft-bench-fix").toString
      val storeFix = graft.core.VectorStore.create[FixedRec](spark, rootFix)
      val fixRows = (0 until 1000000).map(i => FixedRec(i.toLong, i * 2L, i * 0.5, (i & 1) == 0))
      val tFixAppend = timed(storeFix.pushx(fixRows))
      val tFixRead = timed(assert(storeFix.pullx(250000, 500000).size == 500000))
      Seq(
        "store_static_append_1m" -> tFixAppend,
        "store_static_range_read_500k" -> tFixRead,
        "store_array_rows_10k_append" -> tArrAppend,
        "store_array_rows_10k_read" -> tArrRead,
        "store_point_reads_50_batched" -> tBatchedPoints,
        "store_bulk_append_100k" -> tAppend,
        "store_full_scan" -> tScan,
        "store_range_read_1k" -> tRange,
        "store_point_reads_50_cold" -> tPoint,
        "store_point_reads_1k_cached" -> tPointHot,
        "store_concurrent_10x100_reads" -> tConcurrent,
        "store_bulk_append_1m" -> tAppend1m,
        "store_full_scan_1m" -> tScan1m,
        "store_getall_1m" -> tGetall1m
      )
    } catch { case _: Throwable => Seq("store_bench" -> -1.0) }

    val all = queryTimes ++ storeTimes
    val total = queryTimes.map(_._2).filter(_ >= 0).sum

    // Full-precision detail for every dimension goes to a file (the driver
    // keeps only the last 2000 chars of stdout, so a ~3.5k-char JSON line
    // can never be parsed from its tail — BENCH_r01/r02 both show
    // "parsed": null for exactly this reason).
    val qsFull = all.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val detailJson =
      s"""{"metric":"total_query_sec","value":$total,"unit":"sec","queries":$qsFull,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_DETAIL.json"), detailJson + "\n")
    catch { case _: Throwable => () }

    // stdout gets ONE compact line guaranteed to fit the tail window:
    // a curated headline subset at millisecond precision, padded with the
    // remaining dimensions while the 1850-char budget allows (the sbt
    // "[success] Total time ..." epilogue costs ~75 chars of the window).
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
    val headline = Seq(
      "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier", "q6_forecast_revenue",
      "events_hourly_by_type", "events_user_sessions", "events_cohort_retention",
      "pipeline_clean_corpus", "dedup_lsh_candidates", "dedup_jaccard_verified",
      "dedup_simhash", "dedup_clusters", "pagerank_near_dups",
      "knn_brute_force", "embedding_near_dups", "ann_ivf_search", "ann_ivf_index_search",
      "text_tfidf_top_terms", "text_bm25_ranking", "median_quantity_per_flag",
      "grouping_sets_quantity", "rowid_range", "zonemap_orders_daterange", "zorder_rectangle",
      "top_order_per_customer", "asof_last_purchase", "skew_salted_join", "mm_decode_features",
      "store_bulk_append_100k", "store_bulk_append_1m", "store_full_scan_1m", "store_getall_1m",
      "store_range_read_1k", "store_point_reads_50_cold", "store_point_reads_50_batched",
      "store_point_reads_1k_cached", "store_concurrent_10x100_reads",
      "rowid_table_build", "ivf_index_build", "lsh_index_build")
    val allMap = all.toMap
    // cap the failed list: under mass failure an unbounded array would
    // itself overflow the tail window; n_failed carries the true count
    val failedAll = all.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val failed = failedAll.take(8)
    val rest = all.map(_._1).filterNot(headline.contains)
    def render(names: Seq[String]): String = {
      val qs = names.map(k => "\"" + k + "\":" + fmt(allMap(k))).mkString("{", ",", "}")
      s"""{"metric":"total_query_sec","value":${fmt(total)},"unit":"sec","n_dims":${all.size},""" +
        s""""n_failed":${failedAll.size},"failed":${failed.mkString("[", ",", "]")},""" +
        s""""detail":"BENCH_DETAIL.json","queries":$qs,"sf":"$sfDir"}"""
    }
    var names = headline.filter(allMap.contains) ++ rest
    while (render(names).length > 1850 && names.nonEmpty) names = names.init
    println(render(names))
    spark.stop()
  }
}
