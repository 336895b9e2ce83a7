package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-style tests (seeded random cases) pinning each round-3 kernel
  * to an independent plain-Scala reference implementation written in the
  * same fold order — so a codegen bug, an ArrayData indexing slip, or a
  * fold-order drift shows up as a bit mismatch on random inputs, not just
  * on the handful of oracle rows.
  */
class KernelPropertiesSpec extends SparkSpec {

  private val rnd = new Random(20260812)

  private def randVec(n: Int): Array[Float] =
    Array.fill(n)(rnd.nextFloat() * 4f - 2f)

  // ---- reference implementations (same fold order as the kernels) ----

  private def refSqReconCosine(x: Array[Float], q: Array[Float]): Double = {
    var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    x.foreach { f => val v = f.toDouble; if (v < mn) mn = v; if (v > mx) mx = v }
    val scale = (mx - mn) / 255.0
    var dot = 0.0; var nr = 0.0; var nq = 0.0
    val n = math.min(x.length, q.length)
    var i = 0
    while (i < n) {
      val qi = q(i).toDouble
      val recon =
        if (scale == 0.0) mn
        else mn + math.min(255.0, math.max(0.0, math.floor((x(i).toDouble - mn) / scale + 0.5))) * scale
      dot += recon * qi; nr += recon * recon; nq += qi * qi
      i += 1
    }
    dot / (math.sqrt(nr) * math.sqrt(nq))
  }

  private def refPqAdc(x: Array[Float], cb: Array[Array[Float]], q: Array[Float], m: Int): Double = {
    val sub = x.length / m
    var adc = 0.0
    for (mi <- 0 until m) {
      var best = Double.PositiveInfinity; var bestA = -1
      for (a <- cb.indices) {
        var d = 0.0
        for (i <- 0 until sub) {
          val diff = x(mi * sub + i).toDouble - cb(a)(mi * sub + i).toDouble
          d += diff * diff
        }
        if (d < best) { best = d; bestA = a }
      }
      var qd = 0.0
      for (i <- 0 until sub) {
        val diff = q(mi * sub + i).toDouble - cb(bestA)(mi * sub + i).toDouble
        qd += diff * diff
      }
      adc += qd
    }
    adc
  }

  private def refFrameEnergy(bytes: Array[Byte], fs: Int): Seq[Long] = {
    val nf = (bytes.length + fs - 1) / fs
    val e = new Array[Long](nf)
    bytes.indices.foreach(j => e(j / fs) += (bytes(j) & 0xFF).toLong)
    e.toSeq
  }

  test("sq_recon_cosine matches the reference on random vectors (bit-exact)") {
    import spark.implicits._
    val cases = (0 until 60).map { i =>
      val dim = 1 + rnd.nextInt(96)
      (i.toLong, randVec(dim), randVec(dim))
    } :+ ((60L, Array.fill(16)(1.5f), randVec(16))) // constant vector edge
    val got = cases.toDF("id", "x", "q")
      .select(col("id"), VectorFunctions.sqReconCosineF(col("x"), col("q")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    cases.foreach { case (id, x, q) =>
      assert(java.lang.Double.doubleToLongBits(got(id)) ==
        java.lang.Double.doubleToLongBits(refSqReconCosine(x, q)), s"case $id")
    }
  }

  test("pq_adc matches the reference on random vectors and codebooks (bit-exact)") {
    import spark.implicits._
    val m = 4
    val dim = 32
    val cb = Array.fill(8)(randVec(dim))
    val cases = (0 until 40).map(i => (i.toLong, randVec(dim)))
    val q = randVec(dim)
    val got = cases.toDF("id", "x")
      .select(col("id"),
        VectorFunctions.pqAdcF(col("x"), typedLit(cb.map(_.toSeq).toSeq), typedLit(q.toSeq), m))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    cases.foreach { case (id, x) =>
      assert(java.lang.Double.doubleToLongBits(got(id)) ==
        java.lang.Double.doubleToLongBits(refPqAdc(x, cb, q, m)), s"case $id")
    }
  }

  test("byte_frame_energy matches the reference on random payloads") {
    import spark.implicits._
    val cases = (0 until 40).map { i =>
      val n = rnd.nextInt(300)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      (i.toLong, b)
    }
    Seq(1, 7, 64).foreach { fs =>
      val got = cases.toDF("id", "p")
        .select(col("id"), VectorFunctions.byteFrameEnergyF(col("p"), fs))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      cases.foreach { case (id, b) =>
        assert(got(id) == refFrameEnergy(b, fs), s"case $id frame=$fs")
      }
    }
  }
}
