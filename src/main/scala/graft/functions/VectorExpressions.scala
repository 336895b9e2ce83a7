package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding hot path (SURVEY.md §2.7:
  * scalar extensions as codegen'd `Expression`s, the fastest extension tier —
  * preferred over Scala UDFs because they stay inside whole-stage codegen:
  * no SerDe boundary, no boxing of the Float arrays, one fused loop per row).
  *
  * Numeric contract: accumulation is a strict left-to-right fold over
  * `(double) a[i] * (double) b[i]`, the same order as Spark's
  * `aggregate(zip_with(...))` and DuckDB's `list_reduce` — results are
  * bit-identical to the declarative forms, so swapping these in cannot
  * change oracle hashes.
  *
  * At 100 TB scale this is the difference between an embarrassingly
  * parallel codegen'd scan and an interpreter loop per element: brute-force
  * scoring over a 64-dim float column drops from per-element Catalyst
  * dispatch (zip_with builds an intermediate array per row) to a tight
  * JIT-compiled loop with zero allocation.
  */
abstract class FloatVectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, got ${left.dataType.sql} and ${right.dataType.sql}")
  }
}

/** dot_f(a, b): Σ (double)a[i]·(double)b[i] over Array[Float] columns. */
case class DotProductF(left: Expression, right: Expression) extends FloatVectorFold {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine_f(a, b): dot/(√‖a‖²·√‖b‖²) in one fused pass (three accumulators,
  * identical fold order to the three separate `aggregate` calls it replaces).
  * Returns NaN for a zero-norm input, like the declarative form.
  */
case class CosineSimilarityF(left: Expression, right: Expression) extends FloatVectorFold {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API + SQL-registration surface for the native expressions. */
object VectorFunctions {

  def dotF(a: Column, b: Column): Column =
    Bridge.column(DotProductF(Bridge.expression(a), Bridge.expression(b)))

  def cosineF(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarityF(Bridge.expression(a), Bridge.expression(b)))

  /** Register `dot_f` / `cosine_f` for SQL use in `spark.sql(...)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Bridge.registerFunction(spark, "dot_f", args => DotProductF(args(0), args(1)))
    Bridge.registerFunction(spark, "cosine_f", args => CosineSimilarityF(args(0), args(1)))
  }
}
