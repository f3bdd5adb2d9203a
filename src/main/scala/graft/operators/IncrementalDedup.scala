package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate admission — dedup a NEW batch of documents
  * against an already-deduplicated corpus WITHOUT rehashing or
  * re-joining the corpus. This is the shape a growing 100 TB training
  * corpus actually needs: batches arrive continuously, and re-running
  * whole-corpus dedup per batch is O(corpus) per arrival where
  * O(batch) is achievable.
  *
  * The persisted artifact is the corpus' MinHash BAND INDEX —
  * `(band, band_hash, doc_id)` rows, the same banding
  * [[TextDedup.lshBands]] computes for whole-corpus dedup. Signatures
  * are computed once per document for its lifetime:
  *
  *  - [[writeIndex]]: hash the corpus once, persist the bands
  *    (index size ≈ bands × 12 bytes/doc — for a billion-doc corpus
  *    ~100 GB, i.e. ~0.1% of the corpus it indexes);
  *  - [[candidates]]: hash ONLY the batch, then join its bands against
  *    the index. The batch side broadcasts (a batch's bands are MBs),
  *    so the index scan streams map-side — no shuffle of index or
  *    corpus, and the only rows that move are actual band collisions;
  *  - [[dedupeBatch]]: verify candidates with exact n-gram Jaccard.
  *    Corpus text is fetched ONLY for collided ids (broadcast semi-join
  *    prunes the corpus scan before anything shuffles);
  *  - [[admit]]: drop flagged batch docs; [[appendToIndex]] the
  *    survivors' bands so the next batch sees them.
  *
  * Within-batch duplicates are the ordinary [[TextDedup.minhashNearDups]]
  * over the (small) batch — run both when batches can self-duplicate.
  */
object IncrementalDedup {

  /** LSH parameters must match between index build and every later
    * batch — persisted alongside nothing, so the caller owns them (a
    * mismatch surfaces as zero collisions, not silent corruption). */
  final case class Params(shingleN: Int = 3, bands: Int = 12, rows: Int = 4)

  private def bands(docs: DataFrame, p: Params,
                    idCol: String, textCol: String): DataFrame =
    TextDedup.lshBands(docs, idCol, textCol, p.shingleN, p.bands, p.rows)
      .select(col("band"), col("band_hash"), col(idCol).as("doc_id"))

  /** Hash the corpus once and persist its band index at `dir`. */
  def writeIndex(corpus: DataFrame, dir: String, p: Params = Params(),
                 idCol: String = "doc_id", textCol: String = "text"): Unit =
    bands(corpus, p, idCol, textCol)
      .write.mode("overwrite").parquet(dir)

  /** Append a batch's bands to the index (call AFTER [[admit]], with the
    * admitted subset, so rejected duplicates never pollute the index). */
  def appendToIndex(admitted: DataFrame, dir: String, p: Params = Params(),
                    idCol: String = "doc_id", textCol: String = "text"): Unit =
    bands(admitted, p, idCol, textCol)
      .write.mode("append").parquet(dir)

  /** Candidate (batch_id, corpus_id) collisions of the batch against the
    * indexed corpus. The batch's bands broadcast; the index never
    * shuffles. Ids colliding with THEMSELVES (re-submitted doc) are
    * kept — an exact resubmission is the strongest duplicate. */
  def candidates(batch: DataFrame, indexDir: String, p: Params = Params(),
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = batch.sparkSession
    val idx = spark.read.parquet(indexDir)
    val nb = bands(batch, p, idCol, textCol)
      .withColumnRenamed("doc_id", "batch_id")
    idx.join(broadcast(nb), Seq("band", "band_hash"))
      .select(col("batch_id"), col("doc_id").as("corpus_id"))
      .distinct()
  }

  /** Verified near-dups of the batch against the corpus:
    * (batch_id, corpus_id, jaccard ≥ threshold). `corpus` supplies text
    * for collided ids only — its scan is pruned by a broadcast semi-join
    * before any wide operator touches it. */
  def dedupeBatch(batch: DataFrame, corpus: DataFrame, indexDir: String,
                  threshold: Double, p: Params = Params(),
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // cand is consumed twice (corpus prune + verify input) and is tiny
    // post-collision — materialize it so the batch hashing and the index
    // scan run ONCE, not once per consumer
    val cand = candidates(batch, indexDir, p, idCol, textCol).localCheckpoint(true)
    val touched = corpus.join(
      broadcast(cand.select(col("corpus_id").as(idCol)).distinct()),
      Seq(idCol), "left_semi")
    // two-sided verify: id_a is ALWAYS the batch's text, id_b ALWAYS the
    // corpus' — a batch doc re-submitting an existing corpus doc_id must
    // compare batch-vs-corpus text, never fan out across both
    TextDedup.jaccardVerifyTwoSided(
        cand.select(col("batch_id").as("id_a"), col("corpus_id").as("id_b")),
        batch.select(col(idCol), col(textCol)),
        touched.select(col(idCol), col(textCol)),
        idCol, textCol, p.shingleN)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a").as("batch_id"), col("id_b").as("corpus_id"),
        col("jaccard"))
  }

  /** The admissible subset of the batch: docs with NO verified corpus
    * duplicate. Feed this to [[appendToIndex]] and to the corpus sink. */
  def admit(batch: DataFrame, dups: DataFrame,
            idCol: String = "doc_id"): DataFrame =
    batch.join(dups.select(col("batch_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
