package graft.tools

import graft.Bench.BenchRec
import graft.core.{GraftSession, VectorStore}

/** Where does the 1M-row bulk append spend its time? Splits the commit into
  * dataset construction, the count pass, and the stamp+write, so append-path
  * optimizations are measured, not guessed.
  */
object ProfileAppend {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("profile-append")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val rows = (0 until 1000000).map(i => BenchRec(s"user${i % 97}", i.toLong, s"payload-$i-${"x" * 40}"))
    // warmup
    val w = VectorStore.create[BenchRec](spark, java.nio.file.Files.createTempDirectory("pa-w").toString)
    w.pushx(rows.take(10000))

    val ds = t("createDataset")(spark.createDataset(rows))
    val df = ds.toDF()
    val rdd = t("df.rdd + persist + count-pass") {
      val r = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.mapPartitionsWithIndex((pid, it) => Iterator((pid, it.size.toLong))).collect()
      r
    }
    t("stamp+write") {
      val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
        var next = 0L
        it.map { r => val id = next; next += 1; org.apache.spark.sql.Row.fromSeq(id +: r.toSeq) }
      }
      val out = spark.createDataFrame(stamped,
        org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("_rowid", org.apache.spark.sql.types.LongType, nullable = false)
            +: df.schema.fields))
      out.write.mode("overwrite").parquet(java.nio.file.Files.createTempDirectory("pa-out").toString + "/d")
    }
    rdd.unpersist()
    val s2 = VectorStore.create[BenchRec](spark, java.nio.file.Files.createTempDirectory("pa-e2e").toString)
    t("end-to-end pushx")(s2.pushx(rows))
    t("getall 1m")(assert(s2.getall().get.size == 1000000))
    t("getall 1m again")(assert(s2.getall().get.size == 1000000))
    spark.stop()
  }
}
