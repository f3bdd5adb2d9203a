package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.weather.Store

/** Property-based invariants (SURVEY.md §5.3): upsert idempotence,
  * union row conservation, tz round-trip, latest-per-key laws —
  * checked over generated datasets. */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Multiset equality via collect — exceptAll on plans sharing lineage
    * through a Window trips SPARK attribute-rebinding internal errors. */
  def rowsOf(df: org.apache.spark.sql.DataFrame): Map[String, Int] =
    df.collect().toSeq.map(_.toString).groupBy(identity).map { case (k, v) => k -> v.size }

  /** Deterministic ScalaCheck sampling (scalatestplus bridge isn't in the
    * offline dep set): n samples from seeds 0..n-1. */
  def forAllSampled[T](g: Gen[T], n: Int = 10)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  val rowsGen: Gen[List[(Long, Int, Double)]] =
    Gen.listOfN(30, for {
      k <- Gen.choose(0L, 8L)
      v <- Gen.choose(0, 5)
      x <- Gen.choose(-100.0, 100.0)
    } yield (k, v, x))

  test("upsert twice ≡ upsert once (idempotence under replay)") {
    forAllSampled(Gen.zip(rowsGen, rowsGen)) { case (base, batch) =>
      {
        val b = base.toDF("k", "v", "x").dropDuplicates("k", "v")
        val u = batch.toDF("k", "v", "x").dropDuplicates("k", "v")
        val once  = Store.upsertLastWins(b, u, Seq("k", "v"))
        val twice = Store.upsertLastWins(once, u, Seq("k", "v"))
        assert(rowsOf(once) === rowsOf(twice))
      }
    }
  }

  test("upsert key-set = base keys ∪ batch keys; batch wins conflicts") {
    forAllSampled(Gen.zip(rowsGen, rowsGen)) { case (base, batch) =>
      val b = base.toDF("k", "v", "x").dropDuplicates("k")
      val u = batch.toDF("k", "v", "x").dropDuplicates("k")
      val m = Store.upsertLastWins(b, u, Seq("k"))
      val keys = m.select("k").as[Long].collect().toSet
      assert(keys === (base.map(_._1).toSet ++ batch.map(_._1).toSet))
      // every batch row is present verbatim
      val mSet = rowsOf(m)
      rowsOf(u).foreach { case (row, n) => assert(mSet.getOrElse(row, 0) >= n) }
    }
  }

  test("unionByName conserves row counts (O1 concat semantics)") {
    forAllSampled(Gen.zip(rowsGen, rowsGen), 5) { case (a, b) =>
      val da = a.toDF("k", "v", "x")
      val db = b.toDF("k", "v", "x")
      assert(da.unionByName(db).count() === a.length + b.length)
    }
  }

  test("tz round-trip: to_utc ∘ from_utc = id (X2)") {
    val epochGen = Gen.choose(0L, 4102444800L) // 1970..2100
    forAllSampled(Gen.listOfN(20, epochGen), 5) { epochs =>
      {
        val df = epochs.toDF("e").select(timestamp_seconds($"e").as("ts"))
        val rt = df.select(
          $"ts",
          to_utc_timestamp(from_utc_timestamp($"ts", "Asia/Ho_Chi_Minh"), "Asia/Ho_Chi_Minh").as("rt"))
        assert(rt.filter($"ts" =!= $"rt").count() === 0)
      }
    }
  }

  test("latestPerKey: one row per key, row ∈ input, max order value (A7)") {
    forAllSampled(rowsGen) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("k", "v", "x")
        val latest = Relational.latestPerKey(df, Seq("k"), Seq(col("v").desc, col("x").desc))
        assert(latest.count() === rows.map(_._1).distinct.length)
        val inputSet = rowsOf(df)
        rowsOf(latest).foreach { case (row, n) =>  // subset of input
          assert(inputSet.getOrElse(row, 0) >= n) }
        val maxV = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }
        latest.select("k", "v").as[(Long, Int)].collect().foreach { case (k, v) =>
          assert(v === maxV(k))
        }
      }
    }
  }
}
