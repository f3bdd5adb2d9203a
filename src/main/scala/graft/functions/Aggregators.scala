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
}
