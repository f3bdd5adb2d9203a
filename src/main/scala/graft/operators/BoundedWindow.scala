package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.{hash, lit, pmod}

/** EXPLICIT single-partition window over a frame that is SMALL BY
  * CONSTRUCTION — per-partition partial-aggregate spines (O(#input
  * partitions) rows), stage axes (|stages| rows), histogram bins,
  * bucket spines (O(n/B)), vocabulary heads.
  *
  * `Window.orderBy` with no partitionSpec executes identically but
  * logs `WindowExec: No Partition Defined` — the right warning for an
  * accidental O(n) single-partition sort, noise for these bounded
  * frames, and at bench/ops time the noise buries real regressions.
  * Partitioning by `pmod(hash(key), 1)` pins ONE partition explicitly:
  * constant 0 for every row (hash is never null), yet not
  * constant-foldable, so the optimizer cannot strip the partitionSpec
  * and reintroduce the warning the way a `lit(0)` key is.
  *
  * Use ONLY where the frame size is bounded by construction and the
  * bound is documented at the call site — an unbounded frame behind
  * this helper would be exactly the silent scale bug the warning
  * exists to catch.
  */
private[graft] object BoundedWindow {

  /** Single-partition window ordered by `order`; `key` is any non-sort
    * column of the frame (only hashed — its values are irrelevant). */
  def ordered(key: Column, order: Column*): WindowSpec =
    Window.partitionBy(pmod(hash(key), lit(1))).orderBy(order: _*)

  /** Single-partition window, whole-partition default frame — global
    * totals/argmins over a bounded frame (bins, slices, strata). */
  def all(key: Column): WindowSpec =
    Window.partitionBy(pmod(hash(key), lit(1)))

  /** [[all]] with an explicit whole-frame ROWS specification (needed
    * when an orderBy elsewhere would otherwise shrink the frame). */
  def total(key: Column): WindowSpec =
    all(key).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
}
