package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-`Aggregator` UDAF surface (SURVEY §4.2 named this the
  * candidate custom-aggregation hook): geometric mean.
  *
  * Determinism discipline: the per-row `ln` runs in double (one ulp of
  * cross-engine variance, quantized away by the caller's final
  * rounding), but the SUM is carried as BigDecimal — encoded
  * Decimal(38,18), exact — so partition count and merge ORDER cannot
  * wiggle the result the way a double sum would. `finish` divides in
  * double (exact long count) and exponentiates once.
  *
  * Scale shape: a mergeable 2-field buffer (~24 B) per group — the
  * same partial/final two-phase plan as any built-in agg; no state
  * proportional to group size. The cost vs a built-in is the lack of
  * codegen on the update path (udaf boxes per row) — acceptable for
  * the demo; a hot-path version would be a Catalyst
  * DeclarativeAggregate like functions/VectorExpressions' graft_dot.
  */
case class GeoBuf(sumLn: BigDecimal, n: Long)

object GeoMean extends Aggregator[Double, GeoBuf, Double] {
  private val S = 18 // Decimal(38,18): ~7.3e19 rows of |ln|<=44 before overflow
  override def zero: GeoBuf = GeoBuf(BigDecimal(0).setScale(S), 0L)
  override def reduce(b: GeoBuf, x: Double): GeoBuf =
    GeoBuf(b.sumLn + BigDecimal(math.log(x)).setScale(S, BigDecimal.RoundingMode.HALF_UP), b.n + 1)
  override def merge(a: GeoBuf, b: GeoBuf): GeoBuf = GeoBuf(a.sumLn + b.sumLn, a.n + b.n)
  override def finish(r: GeoBuf): Double =
    if (r.n == 0) Double.NaN else math.exp(r.sumLn.toDouble / r.n)
  override def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
