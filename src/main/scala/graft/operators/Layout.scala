package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional data skipping
  * for the 100 TB scan problem a single sort key can't solve: parquet
  * row-group/file pruning works off per-file min/max ranges, and a
  * linear sort gives tight ranges on ONE column while every other
  * column spans the whole domain in every file. Interleaving the bits
  * of two keys orders rows along a space-filling curve, so each file covers
  * a small RECTANGLE of the key space and selective filters on EITHER
  * (or both) dimensions skip most files.
  *
  * The z-value is pure built-in bit arithmetic (shift/and/or), so it
  * whole-stage-codegens and — unlike a UDF — is reproducible in any
  * engine, which is also how the probe oracles it.
  *
  * This is the same layout idea Delta's OPTIMIZE ZORDER BY applies;
  * here it's an explicit write-path operator over plain parquet:
  * normalize each dimension to `bits` bits by min-max scaling, range
  * partition by z-value (one exchange), sort within partitions, write.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two NON-NEGATIVE longs:
    * x occupies even result bits, y odd. Caller normalizes first (see
    * [[normalize]]); inputs are masked to `bits` so out-of-range values
    * wrap rather than corrupt high bits. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val xm = x.bitwiseAND(lit(mask))
    val ym = y.bitwiseAND(lit(mask))
    (0 until bits).map { k =>
      shiftleft(shiftright(xm, k).bitwiseAND(lit(1L)), 2 * k)
        .bitwiseOR(shiftleft(shiftright(ym, k).bitwiseAND(lit(1L)), 2 * k + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** N-dimensional Morton interleave: dimension j of `cols` occupies
    * result bits j, j+d, j+2d, … (d = cols.size). `zValue(x, y, b)` ==
    * `zValueN(Seq(x, y), b)`. The product cols.size·bits must fit a
    * long's positive range. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val d = cols.size
    require(d >= 2, s"need at least 2 dimensions, got $d")
    require(bits >= 1 && d * bits <= 63,
      s"$d dims x $bits bits = ${d * bits} result bits (max 63)")
    val mask = (1L << bits) - 1
    val terms = for {
      k <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.bitwiseAND(lit(mask)), k).bitwiseAND(lit(1L)), k * d + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Min-max scale a column to [0, 2^bits) as a long. `lo`/`hi` come
    * from one stats pass (or known domain bounds). Degenerate hi == lo
    * maps everything to 0. */
  def normalize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val span = math.max(hi - lo, java.lang.Double.MIN_VALUE)
    least(
      floor((c.cast("double") - lit(lo)) / lit(span) * lit((1L << bits).toDouble))
        .cast("long"),
      lit((1L << bits) - 1))
  }

  /** Write `df` z-ordered on (x, y) into `targetFiles` parquet files.
    * One stats pass for the dimension bounds, one range-partitioning
    * exchange on the z-value, an in-partition sort, and the write —
    * the exact cost profile of a linear sorted write, buying min/max
    * locality on BOTH dimensions instead of one. */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
                    bits: Int = 16, targetFiles: Int = 0): Unit = {
    val zc = "__graft_z"
    require(!df.columns.contains(zc), s"input already has a $zc column")
    val b = df.agg(min(x).cast("double"), max(x).cast("double"),
      min(y).cast("double"), max(y).cast("double")).head()
    require(!b.isNullAt(0) && !b.isNullAt(2),
      "writeZOrdered needs non-null dimension bounds (empty input?)")
    val z = zValue(
      normalize(x, b.getDouble(0), b.getDouble(1), bits),
      normalize(y, b.getDouble(2), b.getDouble(3), bits), bits)
    val files =
      if (targetFiles > 0) targetFiles
      else df.sparkSession.sparkContext.defaultParallelism
    df.withColumn(zc, z)
      .repartitionByRange(files, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file locality report for a written dataset: for each file the
    * normalized span each dimension's [min, max] covers. Mean spans
    * near 1/√nFiles on both dims signal a healthy z-layout; a linear
    * sort shows ~1.0 on the secondary dim (no skipping possible). */
  def fileSpans(df: DataFrame, x: Column, y: Column): DataFrame = {
    val b = df.agg(min(x).cast("double"), max(x).cast("double"),
      min(y).cast("double"), max(y).cast("double")).head()
    val (xlo, xhi) = (b.getDouble(0), math.max(b.getDouble(1), b.getDouble(0) + 1e-300))
    val (ylo, yhi) = (b.getDouble(2), math.max(b.getDouble(3), b.getDouble(2) + 1e-300))
    df.groupBy(input_file_name().as("file"))
      .agg(
        ((max(x) - min(x)).cast("double") / (xhi - xlo)).as("x_span"),
        ((max(y) - min(y)).cast("double") / (yhi - ylo)).as("y_span"),
        count(lit(1)).as("n_rows"))
  }
}
