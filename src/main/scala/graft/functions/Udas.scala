package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** User-defined aggregate surface (reference `@pxt.uda`,
  * `/root/reference/pixeltable/func/aggregate_function.py:18-137`): a UDA is
  * an `Aggregator[IN, BUF, OUT]` registered with
  * `org.apache.spark.sql.functions.udaf`. Spark gives partial aggregation
  * (map-side combine) for free — `reduce` runs per partition, `merge`
  * combines partials, so these scale without shuffling raw rows.
  */
object Udas {

  /** weighted mean: Σwx / Σw */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Double)): Double = if (b._2 == 0.0) Double.NaN else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Order-sensitive UDA (the reference's `requires_order_by` class, e.g.
    * make_video / concat_videos_agg): accumulates (orderKey, value) pairs in
    * arbitrary arrival order and sorts once in `finish`. This is the correct
    * distributed shape for order-sensitive aggregation — no global input
    * sort is required, so partial aggregation still applies.
    */
  object OrderedConcat extends Aggregator[(Long, String), List[(Long, String)], String] {
    def zero: List[(Long, String)] = Nil
    def reduce(b: List[(Long, String)], in: (Long, String)): List[(Long, String)] = in :: b
    def merge(a: List[(Long, String)], b: List[(Long, String)]): List[(Long, String)] = a ++ b
    def finish(b: List[(Long, String)]): String =
      b.sortBy(x => (x._1, x._2)).map(_._2).mkString(",")
    def bufferEncoder: Encoder[List[(Long, String)]] =
      Encoders.kryo[List[(Long, String)]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
