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

  test("AlnumFold kernel ≡ regex pair over random unicode strings") {
    import graft.plans.TextExprs
    // chars chosen to stress every branch: alnum, ASCII ws, unicode ws,
    // punctuation, accents, CJK, surrogate pairs, control chars
    val charGen = Gen.oneOf(
      Gen.alphaNumChar,
      Gen.oneOf(' ', '\t', '\n', '\f', '\r', '\u000b'),
      Gen.oneOf('\u00a0', '\u2028', '!', '.', ';', '\u00e9', '\u00df',
        '\u6f22', '\u0001'),
      Gen.const('\ud83d'), Gen.const('\ude00')) // lone + paired surrogates
    val strGen = Gen.listOf(charGen).map(_.mkString)
    forAllSampled(Gen.listOfN(40, strGen), n = 8) { strs =>
      val df = strs.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "t")
      val bad = df.select(
          TextExprs.alnumFold(spark, col("t")).as("k"),
          trim(regexp_replace(regexp_replace(col("t"), "[^a-z0-9\\s]", " "),
            "\\s+", " ")).as("r"))
        .filter(col("k") =!= col("r"))
        .count()
      assert(bad == 0L)
    }
  }

  test("evalBinary cells partition the frame (counts conserve rows)") {
    import graft.operators.Classify
    val pairGen: Gen[List[(Option[Boolean], Option[Boolean])]] =
      Gen.listOf(Gen.zip(Gen.option(Gen.oneOf(true, false)),
        Gen.option(Gen.oneOf(true, false))))
    forAllSampled(pairGen, n = 8) { rows =>
      val df = rows.toDF("pred", "truth")
      val r = Classify.evalBinary(df, col("pred"), col("truth"))
        .select("tp", "fp", "tn", "fn", "n_null")
        .as[(Long, Long, Long, Long, Long)].head()
      assert(r._1 + r._2 + r._3 + r._4 + r._5 == rows.size.toLong)
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
