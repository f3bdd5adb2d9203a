package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque BinaryType columns with typed metadata; decode /
  * feature-extract runs as partition-local batch transforms.
  *
  * The Spark-side architecture here is real and tested — schema, typed
  * Dataset shape, per-partition batching, deterministic partitioning —
  * while the codec itself is STUBBED (this container has no image/audio
  * libraries): `decodeStub` produces a deterministic fake feature vector
  * from the payload bytes. Swapping in a real decoder is a one-function
  * change; nothing in the distributed plan moves.
  *
  * Scala mapPartitions is the JVM analogue of the Python mapInPandas
  * pattern: one iterator per partition, so a real decoder can amortize
  * model/codec initialization per partition instead of per row.
  */
object Multimodal {

  /** Asset row: opaque payload + typed metadata. */
  final case class Asset(
      asset_id: Long,
      media_type: String,        // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Option[Int],
      height: Option[Int],
      duration_ms: Option[Long])

  final case class AssetFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      content_hash: Long,
      features: Array[Float])

  val assetSchema: StructType = Encoders.product[Asset].schema

  /** STUB decoder — deterministic fake: a real implementation would
    * decode the payload (JPEG/PCM/...) and run a feature extractor. The
    * fake derives `dim` floats from a rolling hash of the bytes so tests
    * have stable, content-sensitive values. */
  private[multimodal] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 40).toInt / 8388608.0f) - 1.0f // [-1, 1)
      j += 1
    }
    out
  }

  private def contentHash(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    h
  }

  /** Partition-local feature extraction: iterator-in/iterator-out so a
    * real codec initializes once per partition (the mapInPandas batch
    * shape). The input is repartitioned by asset_id for even work
    * distribution regardless of upstream layout. */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 16)
                     (implicit spark: SparkSession): Dataset[AssetFeatures] = {
    implicit val enc = Encoders.product[AssetFeatures]
    assets
      .repartition(col("asset_id"))
      .mapPartitions { it =>
        // real impl: val codec = Codec.open() — once per partition
        it.map { a =>
          AssetFeatures(
            a.asset_id, a.media_type, a.payload.length.toLong,
            contentHash(a.payload), decodeStub(a.payload, dim))
        }
      }
  }

  /** Exact payload dedup on the 64-bit content hash (binary columns never
    * shuffle whole payloads — only the hash + id move). */
  def dedupByContent(features: Dataset[AssetFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("content_hash"))
      .agg(min(col("asset_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Deterministic synthetic asset table for tests/bench — payload bytes
    * derived from the id (same content ⇒ same features ⇒ dedup works). */
  def syntheticAssets(spark: SparkSession, n: Int, dupEvery: Int = 10): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n.toLong).map { i0 =>
      val i: Long = i0
      val src: Long = if (dupEvery > 0 && i % dupEvery == 0) 0L else i
      val payload = Array.tabulate[Byte](64)(j => ((src * 131 + j * 7) % 251).toByte)
      Asset(i, if (i % 3 == 0) "image" else if (i % 3 == 1) "audio" else "video",
        payload, Some(64), Some(64), None)
    }
  }
}
