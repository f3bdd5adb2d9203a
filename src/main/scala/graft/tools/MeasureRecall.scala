package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextDedup}
import graft.sources.Tables

/** Dev utility: print the raw recall/subset numbers behind the
  * approximate-operator invariant probes (q27/q30/q40/q42) at a given
  * scale factor — run at every SF before choosing an `ok_*` threshold,
  * so each self-oracle asserts a bound with real margin rather than a
  * guessed one. Usage: runMain graft.tools.MeasureRecall <sfDir> */
object MeasureRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.getOrCreate("graft-measure-recall")
    import spark.implicits._

    // ---- q27: MinHash LSH vs bounded exact truth ----
    val docs = Tables.documents(spark, sfDir)
    val bdocs = docs.filter(col("doc_id") < 300)
    val ids = bdocs.select(col("doc_id").as("id_a"))
      .crossJoin(bdocs.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    val truth = TextDedup.jaccardVerify(ids, bdocs).filter(col("jaccard") >= 0.5).cache()
    val truthHigh = truth.filter(col("jaccard") >= 0.7)
    val lsh = TextDedup.minhashNearDups(docs, threshold = 0.5, bands = 12, rows = 4)
      .filter(col("id_a") < 300 && col("id_b") < 300).cache()
    val nTruth = truth.count(); val nTruthHigh = truthHigh.count()
    val nLsh = lsh.count()
    val nHit = lsh.join(truth, Seq("id_a", "id_b"), "left_semi").count()
    val nHitHigh = lsh.join(truthHigh, Seq("id_a", "id_b"), "left_semi").count()
    println(s"RECALL q27 sf=$sfDir nTruth=$nTruth nTruthHigh=$nTruthHigh " +
      s"nLshBounded=$nLsh nHit=$nHit nHitHigh=$nHitHigh " +
      s"recall=${if (nTruth > 0) nHit.toDouble / nTruth else -1} " +
      s"recallHigh=${if (nTruthHigh > 0) nHitHigh.toDouble / nTruthHigh else -1}")

    // ---- q30: SRP-LSH ANN vs bounded exact top-1 ----
    val emb = Tables.embeddings(spark, sfDir)
    val bq = emb.filter(col("vec_id") < 300)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact1 = Similarity.bruteForceTopK(emb, bq, k = 1)
      .select(col("query_id"), col("sim").as("exact_sim")).cache()
    val lsh1 = Similarity.lshTopK(emb, bq, k = 1, bits = 6, dim = 64)
      .select(col("query_id"), col("sim").as("lsh_sim")).cache()
    val nQ = bq.count(); val nFound = lsh1.count()
    val joined = exact1.join(lsh1, Seq("query_id"), "left").cache()
    val nViol = joined.filter(col("lsh_sim") > col("exact_sim") + 1e-9).count()
    val nHit1 = joined.filter(col("lsh_sim") >= col("exact_sim") - 1e-9).count()
    println(s"RECALL q30 sf=$sfDir nQ=$nQ nFound=$nFound nViol=$nViol nHit1=$nHit1 " +
      s"found=${nFound.toDouble / nQ} recall1=${nHit1.toDouble / nQ}")

    // ---- q40: IVF ANN vs bounded exact top-1 ----
    // measure EXACTLY what the q40 gate compares: the probe's own search
    // stage (binRound'ed to 4 decimals) with the probe's 1e-4 tolerance —
    // an unrounded re-derivation here would report margins the gate
    // doesn't actually have near ties
    val q50 = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exactIvf = Similarity.bruteForceTopK(emb, q50, k = 1)
      .select(col("query_id"), col("sim").as("exact_sim")).cache()
    val ivf1 = graft.queries.Probes
      .ivfSearchStage(spark, sfDir, graft.queries.Probes.ivfTrainStage(spark, sfDir))
      .filter(col("rnk") === 1)
      .select(col("query_id"), col("sim").as("ivf_sim")).cache()
    val nQI = q50.count(); val nFoundI = ivf1.count()
    val joinedI = exactIvf.join(ivf1, Seq("query_id"), "left").cache()
    val nViolI = joinedI.filter(col("ivf_sim") > col("exact_sim") + 1e-4).count()
    val nHitI = joinedI.filter(col("ivf_sim") >= col("exact_sim") - 1e-4).count()
    println(s"RECALL q40 sf=$sfDir nQ=$nQI nFound=$nFoundI nViol=$nViolI nHit1=$nHitI " +
      s"found=${nFoundI.toDouble / nQI} recall1=${nHitI.toDouble / nQI}")

    // ---- q42: cosine near-dup LSH vs bounded exact pairs ----
    val bemb = emb.filter(col("vec_id") < 300)
    val ea = bemb.select(col("vec_id").as("id_a"), col("embedding").as("__vec_a"))
    val eb = bemb.select(col("vec_id").as("id_b"), col("embedding").as("__vec_b"))
    val truthC = ea.crossJoin(eb).filter(col("id_a") < col("id_b"))
      .withColumn("sim", graft.plans.HashExprs.cosine(spark, col("__vec_a"), col("__vec_b")))
      .filter(col("sim") >= 0.35)
      .select("id_a", "id_b", "sim").cache()
    val lshC = Similarity.cosineNearDups(emb, threshold = 0.35, bits = 4, dim = 64, nProbe = 3)
      .filter(col("id_a") < 300 && col("id_b") < 300).cache()
    val nTruthC = truthC.count(); val nLshC = lshC.count()
    val nHitC = lshC.join(truthC, Seq("id_a", "id_b"), "left_semi").count()
    val truthCHigh = truthC.filter(col("sim") >= 0.6)
    val nTruthCHigh = truthCHigh.count()
    val nHitCHigh = lshC.join(truthCHigh, Seq("id_a", "id_b"), "left_semi").count()
    println(s"RECALL q42 sf=$sfDir nTruth=$nTruthC nTruthHigh=$nTruthCHigh nLshBounded=$nLshC " +
      s"nHit=$nHitC nHitHigh=$nHitCHigh recall=${if (nTruthC > 0) nHitC.toDouble / nTruthC else -1} " +
      s"recallHigh=${if (nTruthCHigh > 0) nHitCHigh.toDouble / nTruthCHigh else -1}")

    spark.stop()
  }
}
