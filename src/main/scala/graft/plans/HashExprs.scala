package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop hashing kernels used by the custom Catalyst expressions.
  *
  * Higher-order-function formulations of SimHash/MinHash run through
  * Spark's interpreted HOF eval path (ArrayTransform.eval — no whole-stage
  * codegen), which profiled ~5 orders of magnitude slower than a JVM loop.
  * These static kernels are called from generated code, so the expressions
  * stay inside WholeStageCodegen spans.
  */
object HashImpl {

  /** The regex \s class ([ \t\n\x0B\f\r]) — NOT Character.isWhitespace,
    * which is Unicode-aware and would tokenize differently from the HOF
    * references (split on "\\s+") and the DuckDB oracles. */
  @inline def isRegexSpace(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  /** 64-bit FNV-1a over a string's UTF-8 bytes — stable across JVMs,
    * platform-independent (public-domain algorithm). */
  def fnv1a64(bytes: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** finalizer (splitmix64) for better avalanche on top of FNV. */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hash64(s: UTF8String, seed: Long): Long = mix(fnv1a64(s.getBytes, seed))

  /** 62-bit SimHash over whitespace tokens of the lowercased text. */
  def simhash62(text: UTF8String): Long = {
    val s = text.toLowerCase.toString
    val tallies = new Array[Int](62)
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || isRegexSpace(s.charAt(i))) {
        if (i > start) {
          val h = mix(fnv1a64(s.substring(start, i).getBytes("UTF-8"), 0L))
          var b = 0
          while (b < 62) {
            if (((h >>> b) & 1L) == 1L) tallies(b) += 1 else tallies(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 62) {
      if (tallies(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Distinct word n-gram shingles of the lowercased text (semantics
    * identical to the HOF reference graft.functions.Text.shingles:
    * whitespace tokenization, single-space joints, distinct, whole-token
    * fallback for docs shorter than n words). */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val words = new scala.collection.mutable.ArrayBuffer[String]()
    var start = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || isRegexSpace(s.charAt(i))) {
        if (i > start) words += s.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (words.length >= n) {
      var j = 0
      while (j + n <= words.length) {
        val sb = new java.lang.StringBuilder(words(j))
        var t = 1
        while (t < n) { sb.append(' '); sb.append(words(j + t)); t += 1 }
        out.add(UTF8String.fromString(sb.toString))
        j += 1
      }
    } else {
      words.foreach(w => out.add(UTF8String.fromString(w)))
    }
    new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size)))
  }

  /** Distinct n-gram shingle HASHES in one pass — the allocation-free
    * sibling of [[shingles]] for consumers that only need shingle
    * IDENTITY (overlap counts, dedup joins): each window folds its
    * words' UTF-8 bytes plus single-space separators through fnv1a64 —
    * byte-for-byte the string [[shingles]] would have built — then
    * [[mix]]es. No per-window string/UTF8String materializes (per-word
    * byte arrays are computed once); short texts (< n words) hash each
    * word alone, mirroring [[shingles]]'s fallback. First-seen order,
    * distinct. */
  def hashedShingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val words = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var start = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || isRegexSpace(s.charAt(i))) {
        if (i > start) words +=
          s.substring(start, i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        start = i + 1
      }
      i += 1
    }
    @inline def foldBytes(h0: Long, b: Array[Byte]): Long = {
      var h = h0
      var k = 0
      while (k < b.length) { h ^= b(k) & 0xffL; h *= 0x100000001b3L; k += 1 }
      h
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (words.length >= n) {
      var j = 0
      while (j + n <= words.length) {
        var h = 0xcbf29ce484222325L
        var t = 0
        while (t < n) {
          if (t > 0) { h ^= ' ' & 0xffL; h *= 0x100000001b3L }
          h = foldBytes(h, words(j + t))
          t += 1
        }
        out.add(mix(h))
        j += 1
      }
    } else {
      words.foreach { w =>
        out.add(mix(foldBytes(0xcbf29ce484222325L, w)))
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }

  /** LSH band hashes: hash of each `rows`-wide slice of the signature. */
  def bandHashes(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L
      var r = 0
      while (r < rows) {
        val v = sig.getLong(b * rows + r)
        var k = 0
        while (k < 8) { h ^= (v >>> (k * 8)) & 0xffL; h *= 0x100000001b3L; k += 1 }
        r += 1
      }
      out(b) = mix(h)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Cosine similarity between two float arrays, accumulated in double in
    * index order — numerically identical to the HOF reference
    * (cast-to-double zip_with/aggregate) and to a sequential oracle.
    * Returns NaN-free java.lang.Double or null for zero-norm/mismatched
    * inputs. */
  def cosineFloat(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0) java.lang.Double.valueOf(dot / denom) else null
  }

  /** Sign-random-projection bucket: sign bits of v·h_i over `bits` planes
    * given as a flat [bits*dim] array. Double accumulation in index order
    * — bit-identical to the HOF reference in graft.functions.Vectors. */
  def srpBucket(v: ArrayData, planes: Array[Double], bits: Int, dim: Int): Long = {
    var out = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var j = 0
      val off = b * dim
      while (j < dim) { dot += v.getFloat(j).toDouble * planes(off + j); j += 1 }
      if (dot >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def gaussianPlanes(bits: Int, dim: Int, seed: Long): Array[Double] = {
    val rng = new java.util.Random(seed)
    Array.fill(bits * dim)(rng.nextGaussian())
  }

  /** IVF cell assignment: indices of the `nProbe` nearest centroids (L2)
    * from a flat [nCells*dim] centroid array, nearest first. Selection is
    * an allocation-free O(nCells·nProbe) partial pass (no boxing/sort) —
    * this runs per row inside codegen. */
  def nearestCells(v: ArrayData, centroids: Array[Double],
                   nCells: Int, dim: Int, nProbe: Int): ArrayData = {
    val d2 = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      var s = 0.0
      var j = 0
      val off = c * dim
      while (j < dim) {
        val diff = v.getFloat(j).toDouble - centroids(off + j)
        s += diff * diff
        j += 1
      }
      d2(c) = s
      c += 1
    }
    val k = math.min(nProbe, nCells)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](nCells)
    var p = 0
    while (p < k) {
      var best = -1
      var bestD = Double.MaxValue
      var i = 0
      while (i < nCells) {
        // `best < 0` guard: pad-centroid distances can be +Infinity,
        // which never beats MaxValue — the first untaken cell must still
        // be selected or `taken(-1)` throws
        if (!taken(i) && (best < 0 || d2(i) < bestD)) { best = i; bestD = d2(i) }
        i += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Product-quantization encode: L2-normalize the vector, then per
    * subspace j ∈ [0,m) pick the nearest (L2) of the k codebook entries.
    * Codebooks are flat [m][k][dim/m]. Returns the m codes. With m=8,
    * k=16 a 64-dim float vector (256 B) compresses to 8 small ints —
    * the memory ratio that lets a 100 TB embedding corpus's index fit
    * in cluster RAM. */
  def pqEncode(v: ArrayData, codebooks: Array[Double], m: Int, k: Int, dim: Int): ArrayData = {
    val dsub = dim / m
    var na = 0.0
    var i = 0
    while (i < dim) { val x = v.getFloat(i).toDouble; na += x * x; i += 1 }
    val inv = if (na > 0) 1.0 / math.sqrt(na) else 0.0
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = (j * k + c) * dsub
        var s = 0.0
        var t = 0
        while (t < dsub) {
          val diff = v.getFloat(j * dsub + t).toDouble * inv - codebooks(off + t)
          s += diff * diff
          t += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** ADC lookup table for one query: L2-normalize q, then
    * table[j*k + c] = dot(q_subspace_j, codebook[j][c]). Computed ONCE
    * per query row; every corpus pair after that is an O(m) table walk
    * ([[adcScore]]), not an O(dim) vector scan. */
  def pqTable(q: ArrayData, codebooks: Array[Double], m: Int, k: Int, dim: Int): ArrayData = {
    val dsub = dim / m
    var nq = 0.0
    var i = 0
    while (i < dim) { val x = q.getFloat(i).toDouble; nq += x * x; i += 1 }
    val inv = if (nq > 0) 1.0 / math.sqrt(nq) else 0.0
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        val off = (j * k + c) * dsub
        var s = 0.0
        var t = 0
        while (t < dsub) {
          s += q.getFloat(j * dsub + t).toDouble * inv * codebooks(off + t)
          t += 1
        }
        out(j * k + c) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** IVF-PQ encode — the composed index layout: coarse cell by
    * raw-space L2 (bit-identical to [[nearestCells]] nProbe=1, so the
    * cell agrees with the plain-IVF partitioning), then per-subspace
    * RESIDUAL codes against that CELL's own codebook slab. The residual
    * is normalized(v) − centroid[cell] (raw-space centroid: the
    * inner-product decomposition q̂·x̂ = q̂·C + q̂·(x̂−C) is exact for ANY
    * C, so the two spaces never need to agree). Returns
    * [cell, code_0..code_{m-1}] as m+1 ints. */
  def ivfPqEncode(v: ArrayData, centroids: Array[Double],
                  codebooks: Array[Double], nCells: Int, m: Int, k: Int,
                  dim: Int): ArrayData = {
    val dsub = dim / m
    var bestC = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < nCells) {
      var s = 0.0
      var j = 0
      val off = c * dim
      while (j < dim) {
        val diff = v.getFloat(j).toDouble - centroids(off + j)
        s += diff * diff
        j += 1
      }
      if (bestC < 0 || s < bestD) { bestD = s; bestC = c }
      c += 1
    }
    var na = 0.0
    var i = 0
    while (i < dim) { val x = v.getFloat(i).toDouble; na += x * x; i += 1 }
    val inv = if (na > 0) 1.0 / math.sqrt(na) else 0.0
    val r = new Array[Double](dim)
    i = 0
    while (i < dim) {
      r(i) = v.getFloat(i).toDouble * inv - centroids(bestC * dim + i)
      i += 1
    }
    val out = new Array[Int](m + 1)
    out(0) = bestC
    val cbase = bestC * m * k * dsub
    var j = 0
    while (j < m) {
      var best = 0
      var bd = Double.MaxValue
      var cc = 0
      while (cc < k) {
        val off = cbase + (j * k + cc) * dsub
        var s = 0.0
        var t = 0
        while (t < dsub) {
          val diff = r(j * dsub + t) - codebooks(off + t)
          s += diff * diff
          t += 1
        }
        if (s < bd) { bd = s; best = cc }
        cc += 1
      }
      out(j + 1) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** IVF-PQ ADC table for one (query, cell): slots [j·k + c] hold
    * dot(q̂_sub_j, codebook[cell][j][c]) and slot m·k holds the cell
    * base term dot(q̂, centroid[cell]) — so the candidate estimate
    * q̂·x̂ ≈ base + Σ_j table[j·k + code_j] ranks candidates ACROSS
    * probed cells on one comparable scale. */
  def ivfPqTable(q: ArrayData, cell: Int, centroids: Array[Double],
                 codebooks: Array[Double], m: Int, k: Int,
                 dim: Int): ArrayData = {
    val dsub = dim / m
    var nq = 0.0
    var i = 0
    while (i < dim) { val x = q.getFloat(i).toDouble; nq += x * x; i += 1 }
    val inv = if (nq > 0) 1.0 / math.sqrt(nq) else 0.0
    val out = new Array[Double](m * k + 1)
    val cbase = cell * m * k * dsub
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        val off = cbase + (j * k + c) * dsub
        var s = 0.0
        var t = 0
        while (t < dsub) {
          s += q.getFloat(j * dsub + t).toDouble * inv * codebooks(off + t)
          t += 1
        }
        out(j * k + c) = s
        c += 1
      }
      j += 1
    }
    var base = 0.0
    i = 0
    while (i < dim) {
      base += q.getFloat(i).toDouble * inv * centroids(cell * dim + i)
      i += 1
    }
    out(m * k) = base
    new GenericArrayData(out)
  }

  /** Asymmetric-distance score: Σ_j table[j*k + codes[j]] ≈ cosine of
    * (query, corpus vector) since both sides were normalized. */
  def adcScore(codes: ArrayData, table: ArrayData, k: Int): Double = {
    var s = 0.0
    var j = 0
    val m = codes.numElements()
    while (j < m) { s += table.getDouble(j * k + codes.getInt(j)); j += 1 }
    s
  }

  /** Exact integer dot product of two long arrays — the SemDeDup pair
    * gate's hot path (O(|cluster|²) invocations). Null on length
    * mismatch. Exact for |Σ aᵢbᵢ| < 2⁶³ (micro-unit vectors: ~6.4e13
    * at dim 64 — five orders of headroom). */
  def longDot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    java.lang.Long.valueOf(s)
  }

  /** Argmin-squared-distance cluster assignment over a flat [k·dim]
    * centroid matrix; strict `<` keeps the EARLIEST index on ties, and
    * the caller passes centroids sorted by cid, so ties resolve to the
    * lowest cid — identical to the HOF struct-array_min reference. */
  def argMinCluster(v: ArrayData, cents: Array[Long], cids: Array[Int], dim: Int): Int = {
    val k = cids.length
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < k) {
      var dd = 0L
      var j = 0
      val off = c * dim
      while (j < dim) { val t = v.getLong(j) - cents(off + j); dd += t * t; j += 1 }
      if (dd < bestD) { bestD = dd; best = c }
      c += 1
    }
    cids(best)
  }

  /** MinHash signature: k min-hashes over the (already distinct) shingle
    * array. Empty input → Long.MaxValue sentinel per position. */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val bytes = shingles.getUTF8String(i).getBytes
      val base = fnv1a64(bytes, 0L)
      var j = 0
      while (j < k) {
        // one strong base hash per shingle, re-mixed per hash index —
        // the standard "cheap family from one hash" construction
        val h = mix(base ^ (0x9e3779b97f4a7c15L * (j + 1)))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** [[minhashSig]] over PRE-HASHED shingles ([[hashedShingles]]'s
    * output): the same one-base-hash-re-mixed-per-index family, with the
    * already-mixed 64-bit shingle hash as the base — so the signature
    * pipeline never touches shingle STRINGS at all. (A different — but
    * statistically equivalent — family than the string path's; minhash
    * consumers gate on Jaccard recall invariants, not signature
    * values.) */
  def minhashSigFromHashes(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val h = mix(base ^ (0x9e3779b97f4a7c15L * (j + 1)))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** SimHash62 as a native Catalyst expression: null-intolerant unary, long
  * result, codegen = one static call (stays in the WholeStageCodegen
  * span). */
case class SimHash62(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashImpl.simhash62(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashImpl.simhash62($c)")
  override protected def withNewChildInternal(c: Expression): SimHash62 = copy(c)
}

/** MinHash signature expression over an array<string> of shingles. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashImpl.minhashSig(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashImpl.minhashSig($c, $numHashes)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(c)
}

/** Shingle-set expression (text → array<string> of distinct n-grams). */
case class ShinglesN(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashImpl.shingles(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashImpl.shingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShinglesN = copy(c)
}

/** MinHash signature over pre-hashed shingles (array<long> →
  * array<long> of k signature slots). */
case class MinHashSigHashed(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashImpl.minhashSigFromHashes(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashImpl.minhashSigFromHashes($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSigHashed =
    copy(c)
}

/** Hashed-shingle expression (text → array<long> of distinct shingle
  * hashes — [[graft.plans.HashImpl.hashedShingles]]). */
case class HashedShinglesN(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashImpl.hashedShingles(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashImpl.hashedShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): HashedShinglesN =
    copy(c)
}

/** LSH band-hash expression (signature array<long> → array<long> of band
  * hashes). */
case class BandHash(child: Expression, bands: Int, rows: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashImpl.bandHashes(v.asInstanceOf[ArrayData], bands, rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashImpl.bandHashes($c, $bands, $rows)")
  override protected def withNewChildInternal(c: Expression): BandHash = copy(c)
}

/** Cosine similarity over two array<float> columns, double accumulation in
  * index order (bit-compatible with the HOF reference and a sequential
  * SQL oracle). */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any =
    HashImpl.cosineFloat(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = "graft.plans.HashImpl.cosineFloat"
    nullSafeCodeGen(ctx, ev, (l, r) => s"""
      java.lang.Double __cos = $f($l, $r);
      if (__cos == null) { ${ev.isNull} = true; } else { ${ev.value} = __cos.doubleValue(); }
    """)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Exact integer dot product over two ARRAY<BIGINT> columns (SemDeDup
  * pair gate) — codegen'd static call, stays in WholeStageCodegen. */
case class LongDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any =
    HashImpl.longDot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = "graft.plans.HashImpl.longDot"
    nullSafeCodeGen(ctx, ev, (l, r) => s"""
      java.lang.Long __ld = $f($l, $r);
      if (__ld == null) { ${ev.isNull} = true; } else { ${ev.value} = __ld.longValue(); }
    """)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongDot =
    copy(left = l, right = r)
}

/** Integer k-means cluster assignment: centroids ship via
  * addReferenceObj (they come from a fit, not a seed — cf.
  * [[NearestCells]]). One tight loop replaces k HOF zip_with/aggregate
  * distance columns. */
case class ClusterAssign(child: Expression, cents: Array[Long], cids: Array[Int],
                         dim: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    HashImpl.argMinCluster(v.asInstanceOf[ArrayData], cents, cids, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("kmCents", cents, "long[]")
    val iRef = ctx.addReferenceObj("kmCids", cids, "int[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.HashImpl.argMinCluster($c, $cRef, $iRef, $dim)")
  }
  override protected def withNewChildInternal(c: Expression): ClusterAssign = copy(child = c)
}

/** Sign-random-projection LSH bucket expression: planes derived
  * deterministically from (seed, bits, dim) — recomputed identically on
  * every executor, identical to Vectors.hyperplaneBucket's plan-time
  * literals. */
case class SrpBucket(child: Expression, bits: Int, dim: Int, seed: Long)
    extends UnaryExpression {
  @transient private lazy val planes: Array[Double] =
    HashImpl.gaussianPlanes(bits, dim, seed)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashImpl.srpBucket(v.asInstanceOf[ArrayData], planes, bits, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.HashImpl.srpBucket($c, $ref, $bits, $dim)")
  }
  override protected def withNewChildInternal(c: Expression): SrpBucket = copy(c)
}

/** IVF nearest-cells expression: centroids ship via addReferenceObj (they
  * come from a fitted model, not a seed). */
case class NearestCells(child: Expression, centroids: Array[Double],
                        nCells: Int, dim: Int, nProbe: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashImpl.nearestCells(v.asInstanceOf[ArrayData], centroids, nCells, dim, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", centroids, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.HashImpl.nearestCells($c, $ref, $nCells, $dim, $nProbe)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCells = copy(child = c)
}

/** PQ encode / ADC expressions: codebooks ship via addReferenceObj (like
  * [[NearestCells]] — they come from a fitted model, not a seed). */
case class PqEncode(child: Expression, codebooks: Array[Double],
                    m: Int, k: Int, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashImpl.pqEncode(v.asInstanceOf[ArrayData], codebooks, m, k, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.HashImpl.pqEncode($c, $ref, $m, $k, $dim)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
}

case class PqTable(child: Expression, codebooks: Array[Double],
                   m: Int, k: Int, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashImpl.pqTable(v.asInstanceOf[ArrayData], codebooks, m, k, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.HashImpl.pqTable($c, $ref, $m, $k, $dim)")
  }
  override protected def withNewChildInternal(c: Expression): PqTable = copy(child = c)
}

/** IVF-PQ composed-index expressions — coarse centroids AND per-cell
  * residual codebooks ride addReferenceObj (fitted model state, like
  * [[PqEncode]]). */
case class IvfPqEncode(child: Expression, centroids: Array[Double],
                       codebooks: Array[Double], nCells: Int, m: Int,
                       k: Int, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashImpl.ivfPqEncode(v.asInstanceOf[ArrayData], centroids, codebooks,
      nCells, m, k, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("ivfPqCentroids", centroids, "double[]")
    val bref = ctx.addReferenceObj("ivfPqCodebooks", codebooks, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.HashImpl.ivfPqEncode($c, $cref, $bref, $nCells, $m, $k, $dim)")
  }
  override protected def withNewChildInternal(c: Expression): IvfPqEncode =
    copy(child = c)
}

case class IvfPqTable(left: Expression, right: Expression,
                      centroids: Array[Double], codebooks: Array[Double],
                      m: Int, k: Int, dim: Int) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(q: Any, cell: Any): Any =
    HashImpl.ivfPqTable(q.asInstanceOf[ArrayData],
      cell.asInstanceOf[Number].intValue(), centroids, codebooks, m, k, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("ivfPqCentroids", centroids, "double[]")
    val bref = ctx.addReferenceObj("ivfPqCodebooks", codebooks, "double[]")
    defineCodeGen(ctx, ev, (q, cell) =>
      s"graft.plans.HashImpl.ivfPqTable($q, (int)$cell, $cref, $bref, $m, $k, $dim)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IvfPqTable =
    copy(left = l, right = r)
}

case class AdcScore(left: Expression, right: Expression, k: Int) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(codes: Any, table: Any): Any =
    HashImpl.adcScore(codes.asInstanceOf[ArrayData], table.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) => s"graft.plans.HashImpl.adcScore($c, $t, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcScore =
    copy(left = l, right = r)
}

/** Column-facing constructors. Spark 4 removed the public
  * `new Column(expr)` constructor, so expressions are registered in the
  * session FunctionRegistry once and invoked via call_function. */
object HashExprs {

  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // idempotent: re-registering per call floods logs with
    // "SimpleFunctionRegistry ... replaced a previously registered
    // function" warnings (one per query in a bench run). The guard must
    // check EVERY name this method registers — GraftExtensions injects
    // an overlapping set at session build, and a single-name guard
    // would short-circuit on that overlap and leave the rest missing.
    val names = Seq("graft_simhash62", "graft_minhash_sig",
      "graft_shingles", "graft_minhash_sig_hashed",
      "graft_hashed_shingles", "graft_band_hash", "graft_cosine",
      "graft_srp_bucket")
    if (names.forall(n => reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n)))) return
    reg.createOrReplaceTempFunction("graft_simhash62",
      exprs => SimHash62(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      exprs => MinHashSig(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("graft_shingles",
      exprs => ShinglesN(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_sig_hashed",
      exprs => MinHashSigHashed(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("graft_hashed_shingles",
      exprs => HashedShinglesN(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("graft_band_hash",
      exprs => BandHash(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSim(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_srp_bucket",
      exprs => SrpBucket(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].longValue()), "built-in")
  }

  def simhash62(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_simhash62", c)
  }

  def minhashSig(spark: org.apache.spark.sql.SparkSession, c: Column, k: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_minhash_sig", c, lit(k))
  }

  def shingles(spark: org.apache.spark.sql.SparkSession, c: Column, n: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_shingles", c, lit(n))
  }

  def hashedShingles(spark: org.apache.spark.sql.SparkSession, c: Column,
                     n: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_hashed_shingles", c, lit(n))
  }

  def minhashSigHashed(spark: org.apache.spark.sql.SparkSession, c: Column,
                       k: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_minhash_sig_hashed", c, lit(k))
  }

  def bandHash(spark: org.apache.spark.sql.SparkSession, c: Column, bands: Int, rows: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_band_hash", c, lit(bands), lit(rows))
  }

  def cosine(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_cosine", a, b)
  }

  def srpBucket(spark: org.apache.spark.sql.SparkSession, c: Column,
                bits: Int, dim: Int, seed: Long = 42L): Column = {
    ensureRegistered(spark)
    call_function("graft_srp_bucket", c, lit(bits), lit(dim), lit(seed))
  }

  /** Register-once seam for model-derived names: skipping an existing
    * registration is safe ONLY because the name carries a 64-bit
    * content tag of the model arrays (CRC32 of the raw bytes + the JDK
    * content hash) — same name ⇒ same model, so the installed builder
    * is already the right one, and the per-call
    * createOrReplaceTempFunction warning spam disappears. */
  private def registerOnce(spark: org.apache.spark.sql.SparkSession,
                           name: String,
                           builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }

  private def contentTag(bytes: Array[Byte], jdkHash: Int): String = {
    val crc = new java.util.zip.CRC32
    crc.update(bytes)
    (crc.getValue & 0xffffffffL).toHexString + "_" +
      (jdkHash & 0xffffffffL).toHexString
  }

  private def tagOf(a: Array[Double]): String = {
    val bb = java.nio.ByteBuffer.allocate(a.length * 8)
    a.foreach(bb.putDouble)
    contentTag(bb.array(), java.util.Arrays.hashCode(a))
  }

  private def tagOf(a: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(a.length * 8)
    a.foreach(bb.putLong)
    contentTag(bb.array(), java.util.Arrays.hashCode(a))
  }

  /** PQ columns: model-derived registration names, same scheme as
    * [[nearestCells]]. */
  def pqEncode(spark: org.apache.spark.sql.SparkSession, c: Column,
               codebooks: Array[Double], m: Int, k: Int, dim: Int): Column = {
    val name = "graft_pq_encode_" + tagOf(codebooks) + s"_${m}_${k}_$dim"
    registerOnce(spark, name,
      exprs => PqEncode(exprs.head, codebooks, m, k, dim))
    call_function(name, c)
  }

  def pqTable(spark: org.apache.spark.sql.SparkSession, c: Column,
              codebooks: Array[Double], m: Int, k: Int, dim: Int): Column = {
    val name = "graft_pq_table_" + tagOf(codebooks) + s"_${m}_${k}_$dim"
    registerOnce(spark, name,
      exprs => PqTable(exprs.head, codebooks, m, k, dim))
    call_function(name, c)
  }

  def adcScore(spark: org.apache.spark.sql.SparkSession, codes: Column, table: Column,
               k: Int): Column = {
    registerOnce(spark, s"graft_adc_score_$k",
      exprs => AdcScore(exprs(0), exprs(1), k))
    call_function(s"graft_adc_score_$k", codes, table)
  }

  /** Exact integer dot product column over two ARRAY<BIGINT>. */
  def longDot(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column = {
    registerOnce(spark, "graft_long_dot",
      exprs => LongDot(exprs(0), exprs(1)))
    call_function("graft_long_dot", a, b)
  }

  /** Integer k-means assignment column — model-derived registration name,
    * same scheme as [[nearestCells]]. */
  def clusterAssign(spark: org.apache.spark.sql.SparkSession, c: Column,
                    cents: Array[Long], cids: Array[Int], dim: Int): Column = {
    val name = "graft_km_assign_" + tagOf(cents) +
      s"_${java.util.Arrays.hashCode(cids).toHexString}_${cids.length}_$dim"
    registerOnce(spark, name,
      exprs => ClusterAssign(exprs.head, cents, cids, dim))
    call_function(name, c)
  }

  /** IVF-PQ composed-index columns — model-derived names from BOTH
    * model arrays. */
  def ivfPqEncode(spark: org.apache.spark.sql.SparkSession, c: Column,
                  centroids: Array[Double], codebooks: Array[Double],
                  nCells: Int, m: Int, k: Int, dim: Int): Column = {
    val name = "graft_ivfpq_encode_" + tagOf(centroids) + "_" +
      tagOf(codebooks) + s"_${nCells}_${m}_${k}_$dim"
    registerOnce(spark, name,
      exprs => IvfPqEncode(exprs.head, centroids, codebooks, nCells, m, k, dim))
    call_function(name, c)
  }

  def ivfPqTable(spark: org.apache.spark.sql.SparkSession, q: Column,
                 cell: Column, centroids: Array[Double],
                 codebooks: Array[Double], m: Int, k: Int,
                 dim: Int): Column = {
    val name = "graft_ivfpq_table_" + tagOf(centroids) + "_" +
      tagOf(codebooks) + s"_${m}_${k}_$dim"
    registerOnce(spark, name,
      exprs => IvfPqTable(exprs(0), exprs(1), centroids, codebooks, m, k, dim))
    call_function(name, q, cell)
  }

  /** IVF cell assignment column. The centroid array comes from a fitted
    * model, so the registered name is derived from the configuration —
    * registration is idempotent per model and concurrent sessions building
    * different models can't clobber each other's builders. */
  def nearestCells(spark: org.apache.spark.sql.SparkSession, c: Column,
                   centroids: Array[Double], nCells: Int, dim: Int, nProbe: Int): Column = {
    val name = "graft_ivf_cells_" + tagOf(centroids) +
      s"_${nCells}_${dim}_$nProbe"
    registerOnce(spark, name,
      exprs => NearestCells(exprs.head, centroids, nCells, dim, nProbe))
    call_function(name, c)
  }
}
