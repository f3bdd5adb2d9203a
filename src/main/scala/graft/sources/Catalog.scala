package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-facing catalog: registers the corpus (and optionally the weather
  * tables) as temp views so the whole engine surface is reachable via
  * `spark.sql(...)` — the path the reference's dashboard takes
  * (Looker-generated SQL, SURVEY.md §3.3). Custom functions
  * (graft_cosine, graft_simhash62, graft_minhash_sig, graft_shingles,
  * graft_band_hash, graft_srp_bucket, graft_token_stats,
  * graft_stopword_stats, graft_lang_id, graft_fingerprint) are registered
  * alongside, so SQL users get the extension operators too.
  */
object Catalog {

  val corpusTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register every corpus table under its plain name + all graft SQL
    * functions. After this, e.g.:
    * {{{
    * spark.sql("SELECT doc_id, graft_lang_id(text) FROM documents")
    * spark.sql("SELECT a.vec_id, b.vec_id, graft_cosine(a.embedding, b.embedding) ...")
    * }}}
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    corpusTables.foreach {
      // events needs the TIMESTAMP(NANOS) conversion in Tables.events
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t        => Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
    graft.plans.HashExprs.ensureRegistered(spark)
    graft.plans.TextExprs.ensureRegistered(spark)
  }

  def registerWeather(spark: SparkSession, cities: DataFrame, fact: DataFrame): Unit = {
    cities.createOrReplaceTempView("cities")
    fact.createOrReplaceTempView("current_weather")
  }
}
