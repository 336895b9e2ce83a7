package graft.operators

import graft.SparkSpec

/** Real-codec parity: a PNG produced by the fixture encoder must decode
  * (via the same JDK codec the queries use) back to exactly the closed-form
  * pixel statistics the DuckDB oracle predicts analytically.
  */
class MultimodalCodecSpec extends SparkSpec {

  private def predicted(id: Long): (Int, Int, Long, Array[Int]) = {
    val w = (id % 16 + 8).toInt
    val h = (id % 11 + 8).toInt
    var sum = 0L
    val hist = new Array[Int](8)
    for (x <- 0 until w; y <- 0 until h; c <- 0 until 3) {
      val v = ((id * 31 + 7L * x + 13L * y + 101L * c) % 256).toInt
      sum += v
      hist(v >> 5) += 1
    }
    (w, h, sum, hist)
  }

  test("PNG encode→decode round-trip recovers the closed-form statistics") {
    for (id <- Seq(0L, 1L, 7L, 123L, 499L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.pngEncode(id)))
      val raster = img.getRaster
      val (w, h, expSum, expHist) = predicted(id)
      assert(img.getWidth == w && img.getHeight == h)
      assert(raster.getNumBands == 3)
      var sum = 0L
      val hist = new Array[Int](8)
      for (x <- 0 until w; y <- 0 until h; b <- 0 until 3) {
        val v = raster.getSample(x, y, b)
        sum += v
        hist(v >> 5) += 1
      }
      assert(sum == expSum, s"doc $id: sample sum drifted through the codec")
      assert(hist.toSeq == expHist.toSeq, s"doc $id: histogram drifted")
    }
  }

  test("decode and thumbnail queries run the real codec over the parquet fixture") {
    val dec = Multimodal.decodeFeatures(spark, sf())
    val row = dec.where(org.apache.spark.sql.functions.col("doc_id") === 123L).head()
    val (w, h, expSum, _) = predicted(123L)
    assert(row.getAs[Int]("width") == w && row.getAs[Int]("height") == h)
    assert(row.getAs[Int]("channels") == 3)
    assert(row.getAs[Double]("mean_byte") == expSum.toDouble / (w.toLong * h * 3).toDouble)
    val th = Multimodal.thumbnailHistogram(spark, sf())
    assert(th.count() == graft.core.Tables.documents(spark, sf()).count())
  }
}
