package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class FormatsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("lineitem round-trips losslessly through every supported format") {
    val sample = Tables.lineitem(spark, SharedSpark.sf0001)
      .orderBy("l_orderkey", "l_linenumber").limit(200).cache()
    val want = sample.collect().map(_.toString).sorted.toSeq
    Formats.supported.foreach { fmt =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft_fmt_$fmt").toString
      Formats.write(sample, dir, fmt)
      val back = Formats.read(spark, dir, fmt, sample.schema)
      val got = back.collect().map(_.toString).sorted.toSeq
      assert(got === want, s"format $fmt lost data")
    }
    sample.unpersist()
  }
}
