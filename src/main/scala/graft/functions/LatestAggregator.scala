package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One observation for the latest-wins aggregation. */
case class LatestIn(ts_us: Long, event_id: Long, value: Double)

/** Running "latest row so far" (Long.MinValue sentinel = empty). */
case class LatestBuf(ts_us: Long, event_id: Long, value: Double)

/** Custom UDAF: value of the latest observation per key — the keyed
  * last-write-wins upsert (reference: estimate_queue.py:166-178,
  * DynamoDB update_item) expressed as a typed `Aggregator`.
  *
  * Same semantics as built-in `max_by(value, struct(ts, event_id))`;
  * this exists to cover the custom-UDAF surface (SURVEY §7.2 step 8)
  * with a mergeable reduce/merge pair: both sides partial-aggregate
  * map-side, and merge order cannot change the result because the
  * (ts_us, event_id) ordering key is total. */
object LatestAggregator extends Aggregator[LatestIn, LatestBuf, Double] {

  private def isLater(aTs: Long, aId: Long, bTs: Long, bId: Long): Boolean =
    aTs > bTs || (aTs == bTs && aId > bId)

  override def zero: LatestBuf = LatestBuf(Long.MinValue, Long.MinValue, 0.0)

  override def reduce(b: LatestBuf, in: LatestIn): LatestBuf =
    if (isLater(in.ts_us, in.event_id, b.ts_us, b.event_id))
      LatestBuf(in.ts_us, in.event_id, in.value)
    else b

  override def merge(a: LatestBuf, b: LatestBuf): LatestBuf =
    if (isLater(a.ts_us, a.event_id, b.ts_us, b.event_id)) a else b

  override def finish(b: LatestBuf): Double = b.value

  override def bufferEncoder: Encoder[LatestBuf] = Encoders.product[LatestBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
