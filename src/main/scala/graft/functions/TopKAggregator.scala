package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator: keeps the k (id, score) pairs with
  * the highest score per group inside a fixed-size buffer (merge is
  * associative+commutative), so a "top spenders per segment" query
  * needs one partial/final aggregate pass instead of a full rank
  * window — no per-group sort, no whole-partition shuffle of losers.
  * Tie-break: lower id wins at equal score (deterministic).
  *
  * The Aggregator[IN, BUF, OUT] extension point in action (SURVEY.md
  * §7.3's reserved route for when built-ins can't express an
  * aggregate shape).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
    s.sortBy { case (id, score) => (-score, id) }.take(k)

  override def zero: Seq[(Long, Double)] = Seq.empty

  override def reduce(buf: Seq[(Long, Double)],
                      in: (Long, Double)): Seq[(Long, Double)] =
    trim(buf :+ in)

  override def merge(a: Seq[(Long, Double)],
                     b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
