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

  /** Rendezvous (highest-random-weight) shard id for a key: argmax over
    * shard candidates of a per-(key, shard) digest (Thaler & Ravishankar
    * '98) — the shard mapping whose defining property is MINIMAL
    * MOVEMENT under resizing: only keys whose NEW shard's digest wins
    * move (~1/(k+1) of them on grow to k+1), where mod-hashing moves
    * ~(1 − 1/k') of everything. The digest is md5-derived so any engine
    * replays the assignment bit-for-bit ([[graft.operators.Sampling]]'s
    * seeded-md5 discipline); the struct order breaks (impossible-in-
    * practice) 60-bit digest ties to the smaller shard id. Pure in-row
    * expression — no shuffle, no state; cost is O(shards) per row, so
    * this is for shard counts in the hundreds (use jump hashing offline
    * past that). */
  def rendezvousShard(key: Column, shards: Int): Column = {
    require(shards >= 1 && shards <= 4096,
      s"shards must be in 1..4096, got $shards")
    val cands = transform(sequence(lit(0), lit(shards - 1)), s =>
      struct(
        (-conv(substring(md5(concat_ws("|", key.cast("string"),
          s.cast("string"))), 1, 15), 16, 10).cast("long")).as("nd"),
        s.as("sid")))
    array_min(cands).getField("sid").cast("long")
  }

  /** Reshard movement audit — before repartitioning a 100 TB bucketed
    * store from `fromShards` to `toShards`, measure EXACTLY what the
    * move costs: how many rows change shard under [[rendezvousShard]],
    * and whether the movement is the theoretical minimum (on grow,
    * every moved row must land on a NEW shard — rows moving between
    * old shards would be wasted I/O and falsify the mapping).
    *
    * One narrow projection (two in-row rendezvous evaluations) + ONE
    * map-side-combined aggregate; `moved_ppm` is a positive truncating
    * quotient. NULL keys are dropped visibly (`n_null` — they need the
    * caller's null policy, not a silent shard).
    *
    * Output (one row): `from_shards`, `to_shards`, `n`, `n_null`,
    * `n_moved`, `moved_ppm`, `n_moved_to_new` LONG,
    * `moves_minimal` BOOLEAN (every move targets a new shard; trivially
    * true when shrinking is not involved — defined only for grow, NULL
    * otherwise).
    */
  def reshardAudit(df: DataFrame, key: Column, fromShards: Int,
                   toShards: Int): DataFrame = {
    require(fromShards >= 1 && toShards >= 1 && fromShards != toShards,
      s"need two distinct positive shard counts, got $fromShards -> $toShards")
    val all = df.select(key.cast("string").as("__k"))
    val nNull = all.agg(coalesce(sum(when(col("__k").isNull, 1L)
      .otherwise(0L)), lit(0L)).as("n_null"))
    val tagged = all.filter(col("__k").isNotNull)
      .withColumn("__from", rendezvousShard(col("__k"), fromShards))
      .withColumn("__to", rendezvousShard(col("__k"), toShards))
      .withColumn("__moved", col("__from") =!= col("__to"))
    tagged.agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col("__moved"), 1L).otherwise(0L)), lit(0L))
          .as("n_moved"),
        coalesce(sum(when(col("__moved") &&
            col("__to") >= fromShards.toLong, 1L).otherwise(0L)),
          lit(0L)).as("n_moved_to_new"))
      .crossJoin(nNull)
      .withColumn("moved_ppm",
        when(col("n") > 0L, expr("(n_moved * 1000000L) DIV n")))
      .withColumn("moves_minimal",
        when(lit(toShards > fromShards),
          col("n_moved") === col("n_moved_to_new")))
      .select(lit(fromShards.toLong).as("from_shards"),
        lit(toShards.toLong).as("to_shards"), col("n"), col("n_null"),
        col("n_moved"), col("moved_ppm"), col("n_moved_to_new"),
        col("moves_minimal"))
  }
}
