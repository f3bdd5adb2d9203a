package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("feature extraction: deterministic, content-sensitive, right shape") {
    implicit val s = spark
    val assets = Multimodal.syntheticAssets(spark, 30, dupEvery = 10)
    val f1 = Multimodal.extractFeatures(assets, dim = 16).collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(assets, dim = 16).collect().sortBy(_.asset_id)
    assert(f1.length === 30)
    assert(f1.forall(_.features.length === 16))
    // deterministic across runs
    assert(f1.map(_.content_hash).toSeq === f2.map(_.content_hash).toSeq)
    // planted duplicates (ids 0,10,20 share content) agree; others differ
    assert(f1(0).content_hash === f1(10).content_hash)
    assert(f1(0).features.toSeq === f1(20).features.toSeq)
    assert(f1(1).content_hash !== f1(2).content_hash)
  }

  test("content dedup groups identical payloads") {
    implicit val s = spark
    val assets = Multimodal.syntheticAssets(spark, 30, dupEvery = 10)
    val d = Multimodal.dedupByContent(Multimodal.extractFeatures(assets))
    val dupGroup = d.filter(col("n_copies") > 1).collect()
    assert(dupGroup.length === 1)
    assert(dupGroup.head.getAs[Long]("n_copies") === 3L) // ids 0, 10, 20
    assert(dupGroup.head.getAs[Long]("keep_id") === 0L)
  }
}
