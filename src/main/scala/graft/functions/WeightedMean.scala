package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Example custom typed UDAF (SURVEY §2.4 A8): weighted mean
  * `sum(x*w)/sum(w)` as an `Aggregator`, registered via `functions.udaf`.
  *
  * Two-phase by construction: `reduce` is the map-side partial, `merge`
  * the exchange combine — same shape Catalyst gives built-in aggregates
  * (partial + final), so it scales like `avg`.
  */
case class WmBuf(sumWX: Double, sumW: Double)

class WeightedMean extends Aggregator[(Double, Double), WmBuf, Double] {
  override def zero: WmBuf = WmBuf(0.0, 0.0)
  override def reduce(b: WmBuf, in: (Double, Double)): WmBuf =
    WmBuf(b.sumWX + in._1 * in._2, b.sumW + in._2)
  override def merge(a: WmBuf, b: WmBuf): WmBuf =
    WmBuf(a.sumWX + b.sumWX, a.sumW + b.sumW)
  override def finish(b: WmBuf): Double =
    if (b.sumW == 0.0) Double.NaN else b.sumWX / b.sumW
  override def bufferEncoder: Encoder[WmBuf] = Encoders.product[WmBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
