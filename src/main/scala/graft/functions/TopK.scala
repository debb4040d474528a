package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate in a similarity search. */
final case class Scored(vec_id: Long, score: Double)

/** Mutable bounded-heap aggregation buffer: `items(0 until size)` is a
  * binary min-heap with the WORST live candidate at the root, so a
  * full buffer rejects a non-improving candidate in O(1) and accepts
  * an improving one in O(log k). Encodes as a struct(array, int) for
  * spill/shuffle of partial aggregates; slots at `size` and beyond are
  * garbage and ignored on both sides of the round-trip.
  */
final case class TopKBuffer(var items: Array[Scored], var size: Int)

/** Bounded top-k aggregator: keeps the k best candidates per group by
  * (score desc, vec_id asc) — the scalable alternative to
  * row_number()-over-a-full-sort for ANN top-k. Map-side partial
  * aggregation means each partition ships at most k rows per group to
  * the shuffle, so the cost is O(n log k) compute and O(groups × k)
  * shuffle bytes, independent of candidate count per group.
  *
  * The comparator is a total order (ties broken by vec_id), so results
  * are deterministic and oracle-comparable regardless of insertion or
  * merge order.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[Scored, TopKBuffer, Seq[Scored]] {
  require(k >= 1, s"k must be positive, got $k")

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.vec_id < b.vec_id)

  /** Heap order: worse elements float to the root. */
  private def worse(a: Scored, b: Scored): Boolean = better(b, a)

  private def siftUp(h: TopKBuffer, from: Int): Unit = {
    var i = from
    val a = h.items(i)
    var moving = true
    while (moving && i > 0) {
      val p = (i - 1) >> 1
      if (worse(a, h.items(p))) { h.items(i) = h.items(p); i = p }
      else moving = false
    }
    h.items(i) = a
  }

  private def siftDown(h: TopKBuffer): Unit = {
    val a = h.items(0)
    val n = h.size
    var i = 0
    var moving = true
    while (moving) {
      var c = 2 * i + 1
      if (c >= n) moving = false
      else {
        if (c + 1 < n && worse(h.items(c + 1), h.items(c))) c += 1
        if (worse(h.items(c), a)) { h.items(i) = h.items(c); i = c }
        else moving = false
      }
    }
    h.items(i) = a
  }

  private def insert(h: TopKBuffer, a: Scored): TopKBuffer = {
    if (h.size >= k) {
      // full: root is the worst survivor — replace only if a beats it
      if (better(a, h.items(0))) { h.items(0) = a; siftDown(h) }
    } else {
      h.items(h.size) = a
      siftUp(h, h.size)
      h.size += 1
    }
    h
  }

  override def zero: TopKBuffer = TopKBuffer(new Array[Scored](k), 0)

  override def reduce(buf: TopKBuffer, a: Scored): TopKBuffer = insert(buf, a)

  override def merge(x: TopKBuffer, y: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < y.size) { insert(x, y.items(i)); i += 1 }
    x
  }

  override def finish(r: TopKBuffer): Seq[Scored] =
    r.items.take(r.size).sortWith(better).toSeq

  override def bufferEncoder: Encoder[TopKBuffer] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopK {
  def inputEncoder: Encoder[Scored] = Encoders.product[Scored]
}
