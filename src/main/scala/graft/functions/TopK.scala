package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate in a similarity search. */
final case class Scored(vec_id: Long, score: Double)

/** Bounded top-k aggregator: keeps the k best candidates per group by
  * (score desc, vec_id asc) — the scalable alternative to
  * row_number()-over-a-full-sort for ANN top-k. Map-side partial
  * aggregation means each partition ships at most k rows per group to
  * the shuffle, so the cost is O(n log k) compute and O(groups × k)
  * shuffle bytes, independent of candidate count per group.
  *
  * The comparator is a total order (ties broken by vec_id), so results
  * are deterministic and oracle-comparable.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.vec_id < b.vec_id)

  private def trim(s: Seq[Scored]): Seq[Scored] = s.sortWith(better).take(k)

  override def zero: Seq[Scored] = Nil

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    // fast reject: buffer full and candidate is no better than the worst
    if (buf.length >= k && !better(a, buf.last)) buf else trim(buf :+ a)

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = trim(x ++ y)

  override def finish(r: Seq[Scored]): Seq[Scored] = trim(r)

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopK {
  def inputEncoder: Encoder[Scored] = Encoders.product[Scored]
}
