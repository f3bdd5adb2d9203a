package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("zValue interleaves bits (hand-computed cases)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (255L, 255L))
      .toDF("x", "y")
    val z = df.select(Layout.zValue($"x", $"y", 8)).as[Long].collect()
    assert(z(0) === 0L)
    assert(z(1) === 1L)          // x bit 0 -> result bit 0
    assert(z(2) === 2L)          // y bit 0 -> result bit 1
    assert(z(3) === 3L)
    // x=5 (101), y=3 (011): result bits b0=x0=1,b1=y0=1,b2=x1=0,
    // b3=y1=1,b4=x2=1,b5=y2=0 -> 011011 = 27
    assert(z(4) === 27L)
    assert(z(5) === 65535L)      // full 8-bit interleave
  }

  test("z-order gives bounded per-file spans on BOTH dims; linear sort leaves dim2 unpruned") {
    import spark.implicits._
    // a 256x256 grid, both dims uniform
    val grid = spark.range(0, 65536).select(
      (col("id") % 256).as("x"), (col("id") / 256).as("y"))
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString

    Layout.writeZOrdered(grid, s"$base/zorder", $"x", $"y", bits = 8, targetFiles = 16)
    grid.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.parquet(s"$base/linear")

    def spans(p: String) = Layout
      .fileSpans(spark.read.parquet(p), $"x", $"y")
      .agg(avg($"x_span"), avg($"y_span")).as[(Double, Double)].head()

    val (zx, zy) = spans(s"$base/zorder")
    val (lx, ly) = spans(s"$base/linear")
    // linear: x tightly clustered, y spans ~everything in every file
    assert(lx < 0.15, s"linear x span $lx")
    assert(ly > 0.9, s"linear y span $ly")
    // z-order: BOTH dims bounded — each file covers a rectangle
    assert(zx < 0.5, s"zorder x span $zx")
    assert(zy < 0.5, s"zorder y span $zy")
  }

  test("z-ordered write preserves the data exactly") {
    import spark.implicits._
    val df = spark.range(0, 10000).select(
      (col("id") * 7 % 1000).as("x"), (col("id") * 13 % 1000).as("y"), col("id"))
    val dir = java.nio.file.Files.createTempDirectory("graft_layout_rt").toString + "/t"
    Layout.writeZOrdered(df, dir, $"x", $"y", bits = 10, targetFiles = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() === 10000)
    assert(back.join(df, Seq("x", "y", "id"), "left_anti").count() === 0)
    assert(df.join(back, Seq("x", "y", "id"), "left_anti").count() === 0)
  }
}
