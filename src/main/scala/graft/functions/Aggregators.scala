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

  /** Mergeable bounded bottom-k DISTINCT set of longs — the KMV-sketch
    * kernel as ONE aggregate. The buffer is a sorted distinct array of
    * at most k values, so map-side partial aggregation prunes
    * duplicates AND above-k values simultaneously; the shuffle then
    * carries one ≤k-long array per (group, map partition) instead of
    * the raw value stream. This replaces the `distinct()` +
    * `topKPerKey` two-shuffle cascade the KMV operators used before
    * (and sidesteps the dense_rank bottom-k-distinct failure measured
    * in PLANS.md: on dup-heavy streams a WindowGroupLimit partial
    * keeps every copy of a surviving value, pruning ~nothing, while
    * this buffer rejects a duplicate with one binary search).
    *
    * reduce is O(log k) for a rejected value (the common case on
    * dup-heavy streams: one compare against the max, or a binary-search
    * hit) and O(k) for an insert (bounded-size arraycopy); merge is a
    * linear two-pointer dedup-merge of two sorted arrays. Output is
    * the sorted distinct bottom-k — canonical for any input order, so
    * results never depend on partition layout.
    */
  class BottomKDistinctAggregator(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 1, s"k must be >= 1, got $k")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], v: Long): Array[Long] = {
      val n = b.length
      if (n == k && v >= b(n - 1)) b
      else {
        val idx = java.util.Arrays.binarySearch(b, v)
        if (idx >= 0) b
        else {
          val ins = -idx - 1
          val m = if (n == k) k else n + 1
          val out = new Array[Long](m)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = v
          System.arraycopy(b, ins, out, ins + 1, m - ins - 1)
          out
        }
      }
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val out = new Array[Long](math.min(k, a.length + b.length))
        var i = 0; var j = 0; var o = 0
        var last = 0L; var has = false
        while ((i < a.length || j < b.length) && o < out.length) {
          val v =
            if (j >= b.length) { val t = a(i); i += 1; t }
            else if (i >= a.length) { val t = b(j); j += 1; t }
            else if (a(i) <= b(j)) { val t = a(i); i += 1; t }
            else { val t = b(j); j += 1; t }
          if (!has || v != last) { out(o) = v; o += 1; last = v; has = true }
        }
        if (o == out.length) out else java.util.Arrays.copyOf(out, o)
      }
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column-facing bottom-k distinct:
    * `df.groupBy(g).agg(bottomKDistinct(256)($"hash"))` — returns the
    * sorted distinct k smallest longs per group as ARRAY<BIGINT>. */
  def bottomKDistinct(k: Int): Column => Column = {
    val fn = udaf(new BottomKDistinctAggregator(k), Encoders.scalaLong)
    (c: Column) => fn(c)
  }

  /** Set-input twin of [[BottomKDistinctAggregator]]: each input row is
    * an already-sorted-distinct long array (a KMV sketch), and reduce
    * IS the two-pointer merge. Feeding whole sketches instead of
    * exploded values cuts the aggregate-invocation count by the sketch
    * length (×k) and replaces per-value binary-search inserts with one
    * linear merge per row — the hot path of the iterated sketch-union
    * operators ([[graft.operators.Graph.reachProfileKmv]]), where each
    * edge ships one ≤k-long array. Inputs MUST be sorted distinct;
    * null rows are ignored. */
  class BottomKDistinctMergeAggregator(k: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    private val inner = new BottomKDistinctAggregator(k)
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], v: Array[Long]): Array[Long] =
      if (v == null) b else inner.merge(b, v)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      inner.merge(a, b)
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column-facing sketch-union bottom-k:
    * `df.groupBy(g).agg(bottomKDistinctMerge(256)($"sig"))` over
    * sorted-distinct ARRAY<BIGINT> rows. */
  def bottomKDistinctMerge(k: Int): Column => Column = {
    val fn = udaf(new BottomKDistinctMergeAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
    (c: Column) => fn(c)
  }
}
