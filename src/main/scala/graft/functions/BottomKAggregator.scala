package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bottom-k DISTINCT-value aggregator: keeps the k smallest
  * distinct longs per group in a fixed-size sorted buffer. Merge is
  * associative + commutative AND idempotent on duplicates (min-k over
  * a SET) — the order-free-monoid property that makes the bottom-k
  * sketch's streaming state provably equal its batch build for any
  * micro-batch split (qs42; contrast reservoir sampling, whose
  * summary depends on arrival order). State per group is O(k) longs
  * FOREVER — the buffer never grows past k no matter how many rows
  * stream through, which is the entire point of running it as a
  * streaming aggregate.
  *
  * Like [[TopKAggregator]], the Aggregator[IN, BUF, OUT] extension
  * point (SURVEY.md §7.3's reserved route) — here exercised INSIDE a
  * Structured Streaming aggregation.
  */
class BottomKAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  // hoisted: bufferEncoder/outputEncoder are called per plan resolution,
  // so constructing an ExpressionEncoder inside them would re-run
  // serializer derivation on every call (VERDICT r12 nit #3)
  private val seqLongEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  private def trim(s: Seq[Long]): Seq[Long] = s.distinct.sorted.take(k)

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], in: Long): Seq[Long] =
    // fast path: a full buffer rejects anything not under its max
    // without re-sorting (the per-row cost on the hot stream path)
    if (buf.length == k && in >= buf.last) buf else trim(buf :+ in)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    trim(a ++ b)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] = seqLongEncoder

  override def outputEncoder: Encoder[Seq[Long]] = seqLongEncoder
}
