package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One vector's worth of input to the covariance fold. */
final case class CovInput(qv: Seq[Long])

/** Flattened upper-triangle sufficient statistics: `sums(k)` is
  * Σ xᵢ·xⱼ for the k-th (i ≤ j) pair in row-major enumeration,
  * `dimSums(i)` is Σ xᵢ, `n` the vector count — everything a
  * covariance/whitening consumer needs from ONE corpus pass. */
final case class CovStats(sums: Array[Long], dimSums: Array[Long], n: Long)

/** Covariance sufficient-statistics aggregator for `dim`-wide
  * quantized vectors: folds ALL dim·(dim+1)/2 exact-integer cross
  * products of each vector into one flat buffer — no row explosion,
  * no hashing per cell. Map-side partials are a single array of
  * dim·(dim+1)/2 longs per partition; merge is element-wise addition
  * (commutative, order-free). This replaces the
  * explode(2080-per-row) → hash-aggregate formulation, whose cost is
  * generating and hashing corpus×dim² rows; here the same arithmetic
  * runs as a tight in-place loop and the shuffle carries
  * O(partitions × dim²) bytes regardless of corpus size.
  */
final class CovMatrixAggregator(dim: Int)
    extends Aggregator[CovInput, CovStats, CovStats] {
  require(dim >= 1, s"dim must be positive, got $dim")
  private val cells = dim * (dim + 1) / 2

  override def zero: CovStats =
    CovStats(new Array[Long](cells), new Array[Long](dim), 0L)

  override def reduce(b: CovStats, a: CovInput): CovStats = {
    val v = a.qv
    var k = 0
    var i = 0
    while (i < dim) {
      val xi = v(i)
      b.dimSums(i) += xi
      var j = i
      while (j < dim) {
        b.sums(k) += xi * v(j)
        k += 1
        j += 1
      }
      i += 1
    }
    CovStats(b.sums, b.dimSums, b.n + 1)
  }

  override def merge(x: CovStats, y: CovStats): CovStats = {
    var k = 0
    while (k < cells) { x.sums(k) += y.sums(k); k += 1 }
    var i = 0
    while (i < dim) { x.dimSums(i) += y.dimSums(i); i += 1 }
    CovStats(x.sums, x.dimSums, x.n + y.n)
  }

  override def finish(r: CovStats): CovStats = r

  override def bufferEncoder: Encoder[CovStats] = ExpressionEncoder()

  override def outputEncoder: Encoder[CovStats] = ExpressionEncoder()
}

object CovMatrix {
  def inputEncoder: Encoder[CovInput] = Encoders.product[CovInput]

  /** The (k → (i, j)) enumeration shared by the aggregator and any
    * consumer unflattening the triangle (1-based, row-major, i ≤ j). */
  def pairIndex(dim: Int): Seq[(Int, Int, Int)] =
    (1 to dim).flatMap(i => (i to dim).map(j => (i, j)))
      .zipWithIndex.map { case ((i, j), k) => (k, i, j) }
}
