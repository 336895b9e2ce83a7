package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Vecs(id: Long, a: Array[Float], b: Array[Float])

/** Native expression correctness: bit-parity with the declarative
  * aggregate/zip_with fold (same accumulation order), null propagation,
  * SQL registration, and interpreted-vs-codegen agreement (both paths run:
  * wholestage on by default; the eval path via a filter on a literal).
  */
class VectorExpressionsSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 50).map { i =>
      Vecs(i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f), Array.fill(16)(rnd.nextFloat() - 0.5f))
    }.toDS().toDF()
  }

  private val declarativeDot =
    expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, p) -> acc + p)")

  test("dot_f is bit-identical to the declarative fold") {
    val rows = df
      .withColumn("native", VectorFunctions.dotF(col("a"), col("b")))
      .withColumn("declarative", declarativeDot)
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("native")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("declarative")))
    }
  }

  test("cosine_f matches dot/(norm*norm) composition bit-for-bit") {
    val n2 = (c: String) =>
      expr(s"aggregate(zip_with($c, $c, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, p) -> acc + p)")
    val rows = df
      .withColumn("native", VectorFunctions.cosineF(col("a"), col("b")))
      .withColumn("composed", declarativeDot / (sqrt(n2("a")) * sqrt(n2("b"))))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("native")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("composed")))
    }
  }

  test("null inputs propagate null (nullIntolerant)") {
    val rows = df
      .withColumn("a2", when(col("id") < 5, col("a")))
      .withColumn("s", VectorFunctions.cosineF(col("a2"), col("b")))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("s")) == (r.getLong(0) >= 5))
    }
  }

  test("SQL registration: dot_f/cosine_f usable from spark.sql") {
    VectorFunctions.register(spark)
    df.createOrReplaceTempView("vecs_test")
    val n = spark.sql(
      "SELECT id FROM vecs_test WHERE cosine_f(a, b) BETWEEN -1.001 AND 1.001 AND dot_f(a, a) >= 0")
      .count()
    assert(n == 50)
  }

  test("SQL registration: sq_recon_cosine/ln_m/pq_adc usable from spark.sql") {
    VectorFunctions.register(spark)
    df.createOrReplaceTempView("vecs_test2")
    val r = spark.sql(
      """SELECT id, sq_recon_cosine(a, b) AS s, ln_m(CAST(0.5 AS DOUBLE)) AS l,
        |  pq_adc(a, array(a, b), b, 4) AS adc
        |FROM vecs_test2 WHERE id < 3""".stripMargin).collect()
    assert(r.length == 3)
    r.foreach { row =>
      assert(!row.isNullAt(1) && math.abs(row.getDouble(1)) <= 1.001)
      assert(java.lang.Double.doubleToLongBits(row.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(java.lang.Math.log(0.5)))
      assert(row.getDouble(3) >= 0.0)
    }
  }

  test("sq_recon_cosine is bit-identical to the declarative quantize+reconstruct+score") {
    // declarative twin of the fused kernel, using the same SQ8 contract
    val recon =
      """CASE WHEN (CAST(array_max(a) AS DOUBLE) - CAST(array_min(a) AS DOUBLE)) / 255.0D = 0D
        |  THEN CAST(array_min(a) AS DOUBLE)
        |  ELSE CAST(array_min(a) AS DOUBLE) + least(255D, greatest(0D,
        |    floor((CAST(x AS DOUBLE) - CAST(array_min(a) AS DOUBLE)) /
        |          ((CAST(array_max(a) AS DOUBLE) - CAST(array_min(a) AS DOUBLE)) / 255.0D) + 0.5D))) *
        |    ((CAST(array_max(a) AS DOUBLE) - CAST(array_min(a) AS DOUBLE)) / 255.0D) END""".stripMargin
    val rows = df
      .withColumn("native", VectorFunctions.sqReconCosineF(col("a"), col("b")))
      .withColumn("composed", expr(
        s"""aggregate(zip_with(a, b, (x, y) -> ($recon) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, p) -> acc + p) /
           |(sqrt(aggregate(transform(a, x -> ($recon) * ($recon)), CAST(0 AS DOUBLE), (acc, p) -> acc + p)) *
           | sqrt(aggregate(transform(b, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, p) -> acc + p)))""".stripMargin))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("native")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("composed")))
    }
  }

  test("sq_recon_cosine: constant vector reconstructs exactly (scale = 0 guard)") {
    import spark.implicits._
    val a = Array.fill(8)(0.75f)
    val b = Array.tabulate(8)(i => (i + 1).toFloat)
    val sim = Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.sqReconCosineF(col("a"), col("b"))).head().getDouble(0)
    // recon == a exactly, so this is plain cosine(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      dot += a(i).toDouble * b(i).toDouble; na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
    }
    assert(java.lang.Double.doubleToLongBits(sim) ==
      java.lang.Double.doubleToLongBits(dot / (math.sqrt(na) * math.sqrt(nb))))
  }

  test("ln_m uses Math.log (codegen and interpreted agree with the JVM value)") {
    import spark.implicits._
    val us = Seq(0.8894821240461972, 1e-12, 0.5, 0.9999999999)
    val got = us.toDF("u").select(VectorFunctions.lnM(col("u"))).collect().map(_.getDouble(0))
    us.zip(got).foreach { case (u, g) =>
      assert(java.lang.Double.doubleToLongBits(g) ==
        java.lang.Double.doubleToLongBits(java.lang.Math.log(u)))
    }
    // interpreted path
    import org.apache.spark.sql.catalyst.expressions.Literal
    us.foreach { u =>
      val v = LogM(Literal(u)).eval(null).asInstanceOf[Double]
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(java.lang.Math.log(u)))
    }
  }

  test("byte_frame_energy: frame boundaries, unsigned bytes, codegen ≡ interpreted") {
    import spark.implicits._
    // bytes include negative JVM values (0x80.. = unsigned 128..)
    val payload = Array[Byte](1, 2, 3, -1, 0, 127, -128, 5, 9) // 9 bytes, frame=4
    val got = Seq(Tuple1(payload)).toDF("p")
      .select(VectorFunctions.byteFrameEnergyF(col("p"), 4)).head().getSeq[Long](0)
    // frames: [1,2,3,255]=261, [0,127,128,5]=260, [9]=9
    assert(got == Seq(261L, 260L, 9L))
    // interpreted path
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interp = ByteFrameEnergy(
      Literal.create(payload, org.apache.spark.sql.types.BinaryType), 4)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(interp.toLongArray().toSeq == Seq(261L, 260L, 9L))
    // empty payload → zero frames
    val empty = Seq(Tuple1(Array.empty[Byte])).toDF("p")
      .select(VectorFunctions.byteFrameEnergyF(col("p"), 4)).head().getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("interpreted eval agrees with codegen") {
    // Expression.eval path (no codegen): evaluate on a local Literal-only plan
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    val conv = CatalystTypeConverters.createToCatalystConverter(
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-0.5f, 0.25f, 4.0f)
    val interpreted = DotProductF(
      Literal.create(conv(a), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      Literal.create(conv(b), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    ).eval(null).asInstanceOf[Double]
    val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    assert(interpreted == expected)
    import spark.implicits._
    val viaPlan = Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.dotF(col("a"), col("b"))).head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(viaPlan) == java.lang.Double.doubleToLongBits(interpreted))
  }
}
