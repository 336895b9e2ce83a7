package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Z-order layout: multi-dimensional stat pruning evidence against a
  * single-column-sorted control, plus result-equality (layout must never
  * change query results).
  */
class ZOrderSpec extends SparkSpec {

  // 200×200 grid, one row per cell: x = i % 200, y = i / 200
  private def grid: DataFrame =
    spark.range(40000).selectExpr("id % 200 AS x", "id DIV 200 AS y", "id AS payload")

  private lazy val zPath = { val p = tmpDir("zorder") + "/z"; ZOrder.write(grid, Seq("x", "y"), p, 16); p }
  private lazy val xPath = { // control: classic single-column sort layout
    val p = tmpDir("zorder") + "/x"
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(p)
    p
  }

  /** Rows emitted by the parquet scan after row-group/page pruning (AQE off
    * so the scan node and its metrics are directly reachable).
    */
  private def scannedRows(path: String, cond: String): Long = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.read.parquet(path).where(cond)
      // collect() executes THIS df's queryExecution (count() would plan its
      // own aggregate QE and leave these metrics untouched)
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: FileSourceScanExec => f }
        .getOrElse(sys.error("no FileSourceScanExec"))
      scan.metrics("numOutputRows").value
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("z-order prunes on the second dimension where a single-column sort cannot") {
    val zScanned = scannedRows(zPath, "y >= 50 AND y <= 59")
    val xScanned = scannedRows(xPath, "y >= 50 AND y <= 59")
    // x-sorted layout has no y clustering: every file's y range spans
    // everything, nothing is pruned. Z-ordered files cover y-rectangles.
    assert(xScanned == 40000L, s"control unexpectedly pruned: $xScanned")
    assert(zScanned < 40000L / 2, s"z-order pruned too little: $zScanned")
  }

  test("rectangle query on a z-ordered layout reads a fraction of the table") {
    val zScanned = scannedRows(zPath, "x >= 50 AND x <= 59 AND y >= 50 AND y <= 59")
    assert(zScanned < 40000L / 4, s"rectangle scan too broad: $zScanned")
  }

  test("layout never changes results") {
    val cond = "x >= 50 AND x <= 59 AND y >= 50 AND y <= 59"
    val fromZ = spark.read.parquet(zPath).where(cond)
      .select("payload").collect().map(_.getLong(0)).sorted.toSeq
    val direct = grid.where(cond)
      .select("payload").collect().map(_.getLong(0)).sorted.toSeq
    assert(fromZ == direct && fromZ.size == 100)
  }

  test("zvalue interleaves bits (known small cases)") {
    // ranks 0..3 on both axes with bounds [0,3] scale to {0, 21845, 43690, 65535}
    // — checking the curve property we rely on: z is monotone along each
    // axis when the other is fixed, and distinct cells get distinct z.
    val df = spark.range(4).selectExpr("id AS x").crossJoin(spark.range(4).selectExpr("id AS y"))
    val z = ZOrder.zvalue(Seq(col("x"), col("y")), Seq((0.0, 3.0), (0.0, 3.0)))
    val rows = df.select(col("x"), col("y"), z.as("z")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows.values.toSeq.distinct.size == 16, "z collision")
    for (y <- 0L to 3L; x <- 0L until 3L)
      assert(rows((x, y)) < rows((x + 1, y)), s"not monotone in x at ($x,$y)")
    for (x <- 0L to 3L; y <- 0L until 3L)
      assert(rows((x, y)) < rows((x, y + 1)), s"not monotone in y at ($x,$y)")
  }
}
