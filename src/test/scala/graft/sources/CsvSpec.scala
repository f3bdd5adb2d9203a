package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.SharedSpark

/** Robust CSV: schema-conforming rows type cleanly, every malformed
  * row lands in quarantine with its raw line — nothing silently drops. */
class CsvSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def write(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("csvspec")
    Files.writeString(dir.resolve("part.csv"),
      lines.mkString("", "\n", "\n"))
    dir.toString
  }

  test("good rows typed, bad rows quarantined with the raw line, none lost") {
    val path = write(Seq(
      "id,name,score",
      "1,alice,0.5",
      "2,bob,not_a_number",   // uncastable cell
      "3,carol,0.25",
      "4,dave"))              // missing column
    val (good, bad) = Csv.readWithQuarantine(spark, path, schema)
    val g = good.collect().map(r => (r.getLong(0), r.getString(1),
      r.getDouble(2))).toSet
    assert(g === Set((1L, "alice", 0.5), (3L, "carol", 0.25)))
    val b = bad.collect().map(_.getString(0)).toSet
    assert(b === Set("2,bob,not_a_number", "4,dave"))
    assert(good.count() + bad.count() === 4L)
  }

  test("alternate delimiter and headerless files; reserved column rejected") {
    val path = write(Seq("10|x|1.5", "11|y|2.5"))
    val (good, bad) = Csv.readWithQuarantine(spark, path, schema,
      header = false, delimiter = "|")
    assert(good.count() === 2L && bad.count() === 0L)
    assert(good.columns.toSeq === Seq("id", "name", "score"))
    intercept[IllegalArgumentException] {
      Csv.readWithQuarantine(spark, path,
        schema.add(Csv.CorruptCol, StringType))
    }
  }
}
