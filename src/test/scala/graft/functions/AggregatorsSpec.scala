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
}
