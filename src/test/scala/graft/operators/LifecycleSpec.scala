package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The disk-backed per-round state substrate (round 13): diskRound
  * must round-trip values/schema through recomputable parquet scratch,
  * releaseDiskRound must delete superseded rounds' files and NOTHING
  * else, and the iterative chain pattern every Graph/Fusion/Survival
  * loop uses must leave only the final round on disk. */
class LifecycleSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = graft.SharedSpark.spark

  private def scratchPaths(df: DataFrame): Seq[Path] =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths
        case _ => Nil
      }
    }.flatten

  private def exists(p: Path): Boolean =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)

  test("diskRound round-trips values and schema through parquet scratch") {
    import spark.implicits._
    val in = Seq((1L, "a", Seq(1L, 2L)), (2L, "b", Seq.empty[Long]),
      (3L, null.asInstanceOf[String], Seq(7L)))
      .toDF("id", "s", "arr")
    val out = Lifecycle.diskRound(in)
    // eagerly materialized to a real scratch path
    val paths = scratchPaths(out)
    assert(paths.nonEmpty && paths.forall(exists), s"no scratch files: $paths")
    assert(paths.forall(_.toString.contains("graft-scratch-")))
    // values and column order survive; types stay (long, string, array)
    assert(out.columns.toSeq === Seq("id", "s", "arr"))
    val got = out.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[Long](2)))
    assert(got.toSeq === Seq((1L, "a", Seq(1L, 2L)), (2L, "b", Seq()),
      (3L, null, Seq(7L))))
    // the read-back is RECOMPUTABLE: a second action re-reads the file
    assert(out.count() === 3L)
  }

  test("releaseDiskRound deletes a superseded round, skips nulls and non-scratch frames") {
    import spark.implicits._
    val r1 = Lifecycle.diskRound(Seq(1L, 2L).toDF("v"))
    val p1 = scratchPaths(r1)
    assert(p1.forall(exists))
    // a REAL (non-scratch) parquet table must never be touched
    val realDir = java.nio.file.Files
      .createTempDirectory("lifecycle_real").toFile.getAbsolutePath
    Seq(9L).toDF("v").write.mode("overwrite").parquet(realDir)
    val real = spark.read.parquet(realDir)
    Lifecycle.releaseDiskRound(spark, null, real, r1)
    assert(p1.forall(!exists(_)), "superseded round's files survived")
    assert(real.count() === 1L, "non-scratch table was deleted!")
  }

  test("the iterative chain pattern leaves only the final round on disk") {
    import spark.implicits._
    var state = Seq((1L, 0L), (2L, 0L)).toDF("id", "x")
    var paths = Seq.empty[Path]
    (1 to 3).foreach { i =>
      val next = Lifecycle.diskRound(state.withColumn("x", col("x") + i))
      Lifecycle.releaseDiskRound(spark, state)
      assert(paths.forall(!exists(_)), s"round ${i - 1} files survived")
      paths = scratchPaths(next)
      state = next
    }
    assert(paths.forall(exists), "final round must stay readable")
    // the recurrence value is correct through the chain: 0+1+2+3 = 6
    assert(state.orderBy("id").collect().map(_.getLong(1)).toSeq
      === Seq(6L, 6L))
  }
}
