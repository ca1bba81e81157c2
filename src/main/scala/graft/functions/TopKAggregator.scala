package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for [[TopKAggregator]]: a (value, id) pair. */
case class TopKItem(v: Double, id: Long)

/** Bounded buffer: the current top-k items. */
case class TopKBuf(items: Seq[TopKItem])

/** Typed bounded-heap top-k aggregator (SURVEY §7.3's one justified
  * `Aggregator[IN, BUF, OUT]`): keeps the k largest (value, id) pairs per
  * group with an O(k) buffer, merged map-side — the exact-top-k shape that
  * also works incrementally in streaming (state = the k-buffer, bounded
  * regardless of input size, unlike collect+sort). Output is the rank-
  * ordered id list, comma-joined (parquet- and oracle-friendly).
  *
  * Determinism: ties on value break toward the smaller id, matching the
  * oracle's `ORDER BY value DESC, id` convention.
  */
class TopKAggregator(k: Int) extends Aggregator[TopKItem, TopKBuf, String] {

  private def keep(items: Seq[TopKItem]): Seq[TopKItem] =
    items.sortBy(i => (-i.v, i.id)).take(k)

  override def zero: TopKBuf = TopKBuf(Seq.empty)

  override def reduce(buf: TopKBuf, in: TopKItem): TopKBuf =
    TopKBuf(keep(buf.items :+ in))

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf(keep(a.items ++ b.items))

  override def finish(buf: TopKBuf): String =
    buf.items.map(_.id).mkString(",")

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
