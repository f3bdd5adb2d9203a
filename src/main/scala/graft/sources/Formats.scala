package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format source/sink surface: the engine's tables round-trip
  * through any Spark-native columnar/row format. Parquet is the primary
  * store (columnar, predicate pushdown, page indexes); ORC is the
  * columnar alternative; CSV/JSON serve interchange. Schema is always
  * declared on read for text formats — inferSchema never ships in a
  * production path (SURVEY.md §1.3).
  */
object Formats {

  val supported: Seq[String] = Seq("parquet", "orc", "csv", "json")

  def write(df: DataFrame, path: String, format: String): Unit = {
    require(supported.contains(format), s"unsupported format $format")
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  def read(spark: SparkSession, path: String, format: String,
           schema: StructType): DataFrame = {
    require(supported.contains(format), s"unsupported format $format")
    val r = spark.read.format(format).schema(schema)
    (if (format == "csv") r.option("header", "true") else r).load(path)
  }
}
