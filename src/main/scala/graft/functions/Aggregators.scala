package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregates (SURVEY.md §2.10: `Aggregator[IN, BUF, OUT]`
  * registered via `udaf`). The embedding centroid is the canonical one —
  * element-wise mean of Array[Float] vectors with a mergeable
  * (sum-vector, count) buffer, so partial aggregation works map-side and
  * the shuffle carries one buffer per group per partition.
  */
object Aggregators {

  final case class CentroidBuf(sums: Array[Double], n: Long)

  /** Element-wise mean of float vectors. Dim fixed at construction (the
    * merge needs aligned buffers; mismatched input lengths are skipped). */
  class CentroidAggregator(dim: Int)
      extends Aggregator[Array[Float], CentroidBuf, Array[Float]] {
    override def zero: CentroidBuf = CentroidBuf(new Array[Double](dim), 0L)
    override def reduce(b: CentroidBuf, v: Array[Float]): CentroidBuf =
      if (v == null || v.length != dim) b
      else {
        var i = 0
        while (i < dim) { b.sums(i) += v(i); i += 1 }
        CentroidBuf(b.sums, b.n + 1)
      }
    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
      var i = 0
      while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
      CentroidBuf(a.sums, a.n + b.n)
    }
    override def finish(b: CentroidBuf): Array[Float] =
      if (b.n == 0) null
      else {
        val out = new Array[Float](dim)
        var i = 0
        while (i < dim) { out(i) = (b.sums(i) / b.n).toFloat; i += 1 }
        out
      }
    override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Array[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
  }

  /** Column-facing centroid aggregate: `df.groupBy(g).agg(centroid(64)($"embedding"))`. */
  def centroid(dim: Int): Column => Column = {
    val fn = udaf(new CentroidAggregator(dim))
    (c: Column) => fn(c)
  }

  final case class OuterBuf(prods: Array[Long], n: Long)
  final case class OuterMoments(prods: Array[Long], n: Long)

  /** One-pass exact outer-product sum Σ q·qᵀ of micro-quantized float
    * vectors (q = ⌊x·10⁶ + 0.5⌋ — one IEEE multiply + floor, identical
    * on any engine), the moment kernel behind the embedding covariance
    * audit: a dim²-long buffer merges associatively, so partial
    * aggregation runs map-side and the shuffle carries ONE 32 KB buffer
    * per partition instead of n·dim² exploded product rows (the
    * join-based formulation the oracle replays). Flattened row-major:
    * prods[i·dim + j]. Null or wrong-length vectors are skipped (the
    * caller's filter should make that explicit). i64 headroom:
    * n·(10⁶·|x|max)² must fit 2⁶³ — unit-normalized embeddings allow
    * ~9·10⁶ vectors per group; above that, quantize coarser or merge
    * per-shard moment tables in DECIMAL(38,0). */
  class OuterProductAggregator(dim: Int)
      extends Aggregator[Array[Float], OuterBuf, OuterMoments] {
    override def zero: OuterBuf = OuterBuf(new Array[Long](dim * dim), 0L)
    override def reduce(b: OuterBuf, v: Array[Float]): OuterBuf =
      if (v == null || v.length != dim) b
      else {
        val q = new Array[Long](dim)
        var i = 0
        while (i < dim) {
          q(i) = math.floor(v(i) * 1000000.0 + 0.5).toLong; i += 1
        }
        i = 0
        while (i < dim) {
          val qi = q(i); val row = i * dim
          var j = 0
          while (j < dim) { b.prods(row + j) += qi * q(j); j += 1 }
          i += 1
        }
        OuterBuf(b.prods, b.n + 1)
      }
    override def merge(a: OuterBuf, b: OuterBuf): OuterBuf = {
      var i = 0
      while (i < dim * dim) { a.prods(i) += b.prods(i); i += 1 }
      OuterBuf(a.prods, a.n + b.n)
    }
    override def finish(b: OuterBuf): OuterMoments = OuterMoments(b.prods, b.n)
    override def bufferEncoder: Encoder[OuterBuf] = Encoders.product[OuterBuf]
    override def outputEncoder: Encoder[OuterMoments] =
      Encoders.product[OuterMoments]
  }

  /** Column-facing outer-product moments:
    * `df.agg(outerProduct(64)($"embedding"))`. */
  def outerProduct(dim: Int): Column => Column = {
    val fn = udaf(new OuterProductAggregator(dim))
    (c: Column) => fn(c)
  }
}
