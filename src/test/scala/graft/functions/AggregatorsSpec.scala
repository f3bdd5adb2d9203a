package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark
import graft.sources.Tables
import graft.operators.Similarity

class AggregatorsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("Aggregator centroid == posexplode/avg centroid") {
    val emb = Tables.embeddings(spark, SharedSpark.sf0001)
    val viaUdaf = emb.groupBy(col("label"))
      .agg(Aggregators.centroid(64)(col("embedding")).as("c"))
      .select(col("label"), posexplode(col("c")).as(Seq("pos", "v")))
      .select(col("label"), (col("pos") + 1).as("dim"),
        round(col("v").cast("double"), 3).as("x"))
    val viaExplode = Similarity.centroids(emb, "label", scale = 3)
      .select(col("label"), col("dim"), round(col("centroid_val"), 3).as("x"))
    // float32 output vs double path: compare at 3 decimals
    val diff = viaUdaf.join(viaExplode, Seq("label", "dim"))
      .filter(abs(viaUdaf("x") - viaExplode("x")) > 0.002)
    assert(diff.count() === 0)
  }

  test("outerProduct moments == driver-side exact outer-product sum; layout-proof") {
    implicit val s = spark
    import s.implicits._
    val vecs = (0 until 37).map { r =>
      (r.toLong, Array.tabulate(4)(i => ((r * 7 + i * 3) % 11 - 5) / 10.0f))
    }
    def quant(x: Float): Long = math.floor(x * 1000000.0 + 0.5).toLong
    val expect = Array.ofDim[Long](16)
    vecs.foreach { case (_, v) =>
      val q = v.map(quant)
      for (i <- 0 until 4; j <- 0 until 4) expect(i * 4 + j) += q(i) * q(j)
    }
    def run(df: org.apache.spark.sql.DataFrame) = {
      val r = df.agg(Aggregators.outerProduct(4)(col("v")).as("o"))
        .select(col("o.prods"), col("o.n")).head()
      (r.getSeq[Long](0).toArray.toSeq, r.getLong(1))
    }
    val df = vecs.toDF("id", "v")
    assert(run(df) === ((expect.toSeq, 37L)))
    assert(run(df.repartition(7)) === ((expect.toSeq, 37L)))
  }

  test("outerProduct skips null and wrong-length vectors") {
    implicit val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Array(0.5f, -0.5f)),
      (2L, null.asInstanceOf[Array[Float]]),
      (3L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    val r = df.agg(Aggregators.outerProduct(2)(col("v")).as("o"))
      .select(col("o.prods"), col("o.n")).head()
    val p = 500000L * 500000L
    assert(r.getSeq[Long](0).toSeq === Seq(p, -p, -p, p))
    assert(r.getLong(1) === 1L)
  }

  test("covarianceMoments: constant dimension has zero covariance; identity case") {
    implicit val s = spark
    import s.implicits._
    // dim 0 constant 0.5; dim 1 alternating ±0.5 (mean 0 over 4 rows)
    val vecs = (0 until 4).map(r =>
      (r.toLong, Array(0.5f, if (r % 2 == 0) 0.5f else -0.5f)))
    val out = Similarity.covarianceMoments(vecs.toDF("id", "v"), col("v"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(6)).toMap
    assert(out((0L, 0L)) === 0L) // constant dim: n·Σq² − (Σq)² = 0
    assert(out((0L, 1L)) === 0L) // constant × zero-mean: independent
    // var of ±5e5 over 4 rows: (4·4·(5e5)² − 0) DIV 4 = 1e12
    assert(out((1L, 1L)) === 1000000000000L)
  }

  test("topComponent: axis-aligned cloud pins the axis; lambda is the variance") {
    implicit val s = spark
    import s.implicits._
    // all variance on dim 0: q = ±1e6, ±2e6 -> cov_q2 = (0,0)->1e13
    val vecs = Seq(Array(1f, 0f), Array(-1f, 0f), Array(2f, 0f),
      Array(-2f, 0f)).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val out = Similarity.topComponent(vecs.toDF("id", "v"), col("v"),
      dim = 2, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((0L, 1000000L, 10000000000000L),
      (1L, 0L, 10000000000000L)))
  }

  test("topComponent: (1,-1) principal axis — symmetry-breaking start converges, " +
      "lambda doubles, signs deterministic") {
    implicit val s = spark
    import s.implicits._
    val vecs = Seq(Array(1f, -1f), Array(-1f, 1f), Array(2f, -2f),
      Array(-2f, 2f)).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vecs.toDF("id", "v")
    val out = Similarity.topComponent(df, col("v"), 2, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // top eigenvalue of [[v,-v],[-v,v]] is 2v; iteration dynamics fix
    // the sign: u after round 1 is (-1e13, +1e13)
    assert(out === Seq((0L, -1000000L, 20000000000000L),
      (1L, 1000000L, 20000000000000L)))
    // layout independence
    val out2 = Similarity.topComponent(df.repartition(5), col("v"), 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out2 === out)
  }

  test("topComponent: identical vectors (zero covariance) yield the zero vector") {
    implicit val s = spark
    import s.implicits._
    val vecs = (0 until 5).map(i => (i.toLong, Array(0.25f, -0.75f)))
    val out = Similarity.topComponent(vecs.toDF("id", "v"), col("v"), 2, 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((0L, 0L), (0L, 0L)))
  }

  test("typed Dataset view + chunker generator") {
    implicit val s = spark
    import s.implicits._
    // typed view over a flattened fixture
    val json =
      """{"coord":{"lon":1.0,"lat":2.0},"weather":[{"id":800,"main":"Clear","description":"x","icon":"01d"}],
        |"main":{"temp":30.0,"feels_like":31.0,"temp_min":29.0,"temp_max":31.0,"pressure":1000,"humidity":50},
        |"wind":{"speed":1.5,"deg":90},"clouds":{"all":0},"dt":1764129959,
        |"sys":{"country":"VN","sunrise":1,"sunset":2},"timezone":25200,"id":9,"name":"X","cod":200}""".stripMargin.replace("\n", "")
    val fact = graft.weather.Flatten.currentFact(
      graft.weather.Flatten.flattenCurrent(
        graft.weather.Flatten.parseCurrent(s.createDataset(Seq(json)))))
    val ds = graft.weather.Flatten.typedCurrent(fact)
    val row: graft.weather.CurrentWeather = ds.head()
    assert(row.city_id === 9L && row.temp === Some(30.0) && row.visibility === None)

    // chunker: 10 words, size 4 → chunks of 4/4/2
    val ch = Seq("a b c d e f g h i j").toDF("text")
      .select(posexplode(Text.chunks(col("text"), 4)).as(Seq("i", "c")))
      .select("c").as[String].collect().toSeq
    assert(ch === Seq("a b c d", "e f g h", "i j"))
  }

  test("bottomKDistinct buffer: reduce/merge dedup, truncate, stay sorted") {
    val agg = new Aggregators.BottomKDistinctAggregator(4)
    // reduce: insert, dup-reject, reject-above-max-when-full, displace
    var b = agg.zero
    for (v <- Seq(5L, 3L, 9L, 3L, 7L, 9L)) b = agg.reduce(b, v)
    assert(b.toSeq === Seq(3L, 5L, 7L, 9L)) // full, dups rejected
    b = agg.reduce(b, 100L) // above max while full: rejected
    assert(b.toSeq === Seq(3L, 5L, 7L, 9L))
    b = agg.reduce(b, 4L) // displaces the max
    assert(b.toSeq === Seq(3L, 4L, 5L, 7L))
    b = agg.reduce(b, Long.MinValue)
    assert(b.toSeq === Seq(Long.MinValue, 3L, 4L, 5L))
    // merge: two-pointer dedup-merge, truncation at k, empty identities
    assert(agg.merge(agg.zero, b) eq b)
    assert(agg.merge(b, agg.zero) eq b)
    val m = agg.merge(Array(1L, 3L, 5L, 7L), Array(2L, 3L, 6L, 8L))
    assert(m.toSeq === Seq(1L, 2L, 3L, 5L))
    val short = agg.merge(Array(1L, 2L), Array(1L, 2L))
    assert(short.toSeq === Seq(1L, 2L)) // deduped shorter-than-alloc copy
  }

  test("bottomKDistinct == distinct+sort+limit per key; layout-proof") {
    implicit val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 4000).map(_ =>
      (rnd.nextInt(7).toLong, rnd.nextInt(40).toLong))
    for (parts <- Seq(1, 3, 13)) {
      val df = rows.toDF("g", "v").repartition(parts)
      val got = df.groupBy(col("g"))
        .agg(Aggregators.bottomKDistinct(8)(col("v")).as("sig"))
        .select(col("g"), col("sig"))
        .as[(Long, Array[Long])].collect().map { case (g, a) => g -> a.toSeq }
        .toMap
      val want = rows.groupBy(_._1).map { case (g, vs) =>
        g -> vs.map(_._2).distinct.sorted.take(8)
      }
      assert(got === want, s"parts=$parts")
    }
  }
}
