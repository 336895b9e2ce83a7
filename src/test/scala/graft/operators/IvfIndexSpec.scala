package graft.operators

import graft.SparkSpec

/** The persisted cell-partitioned IVF index: results must equal the ad-hoc
  * semi-join search, and the scan must prune to the probe cells at the
  * SOURCE (partition filter; unprobed cell directories never read).
  */
class IvfIndexSpec extends SparkSpec {

  test("index search equals the ad-hoc multiprobe search") {
    val root = tmpDir("ivf-index")
    Similarity.buildIvfIndex(spark, sf(), root)
    val viaIndex = Similarity.searchIvfIndex(spark, root, sf(),
        Similarity.ivfQueryId, Similarity.ivfK, Similarity.ivfNprobe)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val adhoc = Similarity.ivfSearchMultiprobe(spark, sf())
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaIndex == adhoc)
  }

  test("the scan prunes unprobed cells at the source (partition filter)") {
    val root = tmpDir("ivf-index-prune")
    Similarity.buildIvfIndex(spark, sf(), root)
    // AQE off so the executed plan exposes the FileSourceScanExec and its
    // post-pruning metrics directly (inputFiles is pre-pruning and useless
    // as evidence here)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Similarity.searchIvfIndex(spark, root, sf(),
        Similarity.ivfQueryId, Similarity.ivfK, nprobe = 1)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell"),
        s"expected a partition filter on cell in:\n$plan")
      df.collect()
      val scan = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      val readFiles = scan.metrics("numFiles").value
      val allFiles = df.sparkSession.read.parquet(root).inputFiles.length
      assert(readFiles < allFiles,
        s"expected pruned scan ($readFiles read of $allFiles total)")
      // one probed cell of numCells → at most ~1/numCells of the files + slack
      assert(readFiles <= allFiles / 2, s"pruning too weak: $readFiles of $allFiles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
