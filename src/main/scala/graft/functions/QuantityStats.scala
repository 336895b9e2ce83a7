package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY.md §2.7: `Aggregator[IN,BUF,OUT]` is the
  * idiomatic tier for custom aggregation state) — exact count/mean/
  * population-variance over a quantity expressed in integer cents.
  *
  * All accumulation is int64 (cents and cents², bounded for quantities
  * ≤ ~10⁶ units per the data profile), so partial-aggregate merge order
  * cannot change a single bit — the mean/variance doubles are derived once
  * at the end by a fixed expression the DuckDB oracle mirrors. This is the
  * engine's template for sketch-style custom aggregates: associative,
  * order-insensitive buffer; nullable-safe input; final transform at
  * `finish`.
  */
final case class QStatsBuf(n: Long, sumCents: Long, sumSqCents: Long)
final case class QStats(n: Long, mean: Double, varPop: Double)

object QuantityStats extends Aggregator[java.lang.Double, QStatsBuf, QStats] {

  override def zero: QStatsBuf = QStatsBuf(0L, 0L, 0L)

  override def reduce(b: QStatsBuf, a: java.lang.Double): QStatsBuf =
    if (a == null) b
    else {
      // exact: quantities carry ≤2 decimals → integer cents
      val cents = math.round(a.doubleValue() * 100.0)
      QStatsBuf(b.n + 1, b.sumCents + cents, b.sumSqCents + cents * cents)
    }

  override def merge(x: QStatsBuf, y: QStatsBuf): QStatsBuf =
    QStatsBuf(x.n + y.n, x.sumCents + y.sumCents, x.sumSqCents + y.sumSqCents)

  override def finish(b: QStatsBuf): QStats =
    if (b.n == 0) QStats(0L, Double.NaN, Double.NaN)
    else {
      val n = b.n.toDouble
      val mean = b.sumCents.toDouble / n / 100.0
      // E[x²] − E[x]² in cent² space, then scale to unit²
      val varPop = (b.sumSqCents.toDouble / n - (b.sumCents.toDouble / n) * (b.sumCents.toDouble / n)) / 10000.0
      QStats(b.n, mean, varPop)
    }

  override def bufferEncoder: Encoder[QStatsBuf] = Encoders.product[QStatsBuf]
  override def outputEncoder: Encoder[QStats] = Encoders.product[QStats]
}
