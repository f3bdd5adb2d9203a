package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.plans.HashExprs

/** Similarity search over embedding columns (ArrayType(FloatType)).
  *
  * Two tiers:
  *  - `bruteForceTopK`: exact cosine top-k. The query set is broadcast
  *    (it is small by construction); candidates stream through a
  *    map-side cross join — no shuffle of the big side — then a per-query
  *    top-k window. Correctness baseline and perfectly adequate when
  *    |queries| · |corpus| is bounded.
  *  - `lshTopK`: sign-random-projection bucketed ANN — the 100 TB path.
  *    Both sides hash to `bits`-bit buckets; the join is an equi-join on
  *    the bucket id (linear shuffle, no cross product), then exact cosine
  *    re-ranking inside buckets. Recall tunes with fewer bits / multiple
  *    tables.
  */
object Similarity {

  /** Shared re-rank tail of every ANN/exact search: self-match filter,
    * exact cosine, per-query rank, top-k, canonical output shape. The
    * candidate frame must carry (queryIdCol, idCol, vecCol's candidate
    * vector, "__q_vec"). */
  private def rerank(cands: DataFrame, k: Int, idCol: String, queryIdCol: String,
                     vecCol: String = "embedding"): DataFrame = {
    val spark = cands.sparkSession
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("sim").desc, col(idCol).asc)
    cands
      .filter(col(idCol) =!= col(queryIdCol))
      .withColumn("sim", HashExprs.cosine(spark, col(vecCol), col("__q_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("sim"), col("rank"))
  }

  /** Missing-path discipline shared by every persisted-index reader: a
    * mistyped path is an operator error and fails LOUDLY — only a dir
    * that exists but holds no part files (an empty snapshot) may read
    * as empty. */
  private def requireIndexPath(spark: org.apache.spark.sql.SparkSession,
                               path: String, kind: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    require(root.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(root), s"$kind index path does not exist: $path")
  }

  /** The canonical empty top-k frame (query_id type from the caller's
    * queries frame; LONG ids — the library-wide vector-id contract). */
  private def emptyTopK(spark: org.apache.spark.sql.SparkSession,
                        queries: DataFrame, queryIdCol: String,
                        idCol: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(queryIdCol,
          queries.schema(queryIdCol).dataType),
        org.apache.spark.sql.types.StructField(idCol,
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sim",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.IntegerType))))

  /** Exact top-k nearest neighbors by cosine for each query row.
    * `queries` must be small enough to broadcast. Output:
    * (query_id, vec_id, sim, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     queryIdCol: String = "query_id"): DataFrame = {
    val q = queries.select(col(queryIdCol), col(vecCol).as("__q_vec"))
    rerank(corpus.crossJoin(broadcast(q)), k, idCol, queryIdCol, vecCol)
  }

  /** LSH-bucketed approximate top-k: equi-join on the hyperplane bucket,
    * exact re-rank within buckets. Lower `bits` → bigger buckets → higher
    * recall and cost. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int, dim: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              queryIdCol: String = "query_id"): DataFrame = {
    val spark = corpus.sparkSession
    val cb = corpus.withColumn("__bucket", HashExprs.srpBucket(spark, col(vecCol), bits, dim))
    val qb = queries
      .select(col(queryIdCol), col(vecCol).as("__q_vec"))
      .withColumn("__bucket", HashExprs.srpBucket(spark, col("__q_vec"), bits, dim))
    rerank(cb.join(qb, "__bucket"), k, idCol, queryIdCol, vecCol)
  }

  /** Explode a frame to one row per probed bucket: the home SRP bucket
    * plus its `nProbe−1` single-low-bit flips. The hash is computed ONCE
    * into a materialized column; the flip array references that
    * attribute, so probing never re-runs the bits×dim projection per
    * probe (and the two multi-probe operators share one definition). */
  private def withProbedBuckets(df: DataFrame, vecCol: String, bits: Int, dim: Int,
                                nProbe: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= bits + 1, "nProbe in [1, bits+1]")
    val home = HashExprs.srpBucket(df.sparkSession, col(vecCol), bits, dim)
    df.withColumn("__home", home)
      .withColumn("__bucket", explode(array(
        (Seq(col("__home")) ++
          (0 until nProbe - 1).map(i => col("__home").bitwiseXOR(lit(1L << i)))): _*)))
      .drop("__home")
  }

  /** Multi-probe LSH top-k: each query also probes the buckets at Hamming
    * distance 1 (single sign-bit flips) — the standard recall lever that
    * costs probe-factor extra lookups instead of extra index copies.
    * Shuffle volume stays linear: |queries|·nProbe rows join the bucketed
    * corpus on the bucket key. */
  def lshTopKMultiProbe(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int, dim: Int,
                        nProbe: Int,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        queryIdCol: String = "query_id"): DataFrame = {
    val spark = corpus.sparkSession
    val cb = corpus.withColumn("__bucket", HashExprs.srpBucket(spark, col(vecCol), bits, dim))
    val qb = withProbedBuckets(
      queries.select(col(queryIdCol), col(vecCol).as("__q_vec")),
      "__q_vec", bits, dim, nProbe)
    // No dedup needed: a corpus vector lives in exactly ONE bucket and a
    // query's probed buckets (home + distinct single-bit flips) are all
    // DISTINCT, so each (query, candidate) pair joins at most once — a
    // dropDuplicates here would re-exchange the full candidate stream
    // for nothing (measured ~2× on the q194 penalty pass).
    rerank(cb.join(qb, "__bucket"), k, idCol, queryIdCol, vecCol)
  }

  /** IVF (inverted-file) ANN — the second index family next to SRP-LSH:
    * k-means centroids partition the space into cells; the corpus lives in
    * its nearest cell, queries probe their `nProbe` nearest cells, exact
    * cosine re-ranks inside.
    *
    * Training is the standard fit-on-a-sample IVF recipe: a BOUNDED
    * sample (`maxSample` rows) is collected to the driver and clustered
    * with k-means++-seeded Lloyd's locally. At 100 TB the sample is still
    * `maxSample` rows — training cost is flat in corpus size — and the
    * resulting centroids broadcast inside the NearestCells expression.
    * (A distributed fit would shuffle the whole corpus through an ML
    * pipeline to compute what a 4096-row sample determines just as well;
    * per-fit job overhead dominated q40's bench time by ~3×.) The
    * sample is the `maxSample` LOWEST-id rows — an unordered limit
    * would hand back whichever partitions answer first, so centroids
    * (and every downstream recall/equality assertion) would drift with
    * partition layout; orderBy+limit plans as TakeOrderedAndProject
    * (per-partition top-k, no full sort), so determinism costs one
    * bounded pass, not a shuffle of the corpus. */
  def ivfCentroids(corpus: DataFrame, nCells: Int, dim: Int,
                   vecCol: String = "embedding", seed: Long = 42L,
                   maxSample: Int = 4096, idCol: String = "vec_id"): Array[Double] = {
    val sample: Array[Array[Double]] = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull && size(col("v")) === dim)
      .orderBy(col(idCol))
      .limit(maxSample)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    // degenerate corpora (fewer vectors than cells, or empty) can't train
    // k-means — fall back to a single zero cell: every vector lands in
    // cell 0 and the search degrades to brute force within it. Remaining
    // cell slots are padded far away (1e150 per dim — finite, so the
    // squared distance stays well-ordered) and are never the nearest.
    def padded(centers: Array[Array[Double]]): Array[Double] = {
      val out = Array.fill(nCells * dim)(1e150)
      centers.zipWithIndex.foreach { case (c, i) =>
        require(c.length == dim, s"centroid dim ${c.length} != expected $dim")
        System.arraycopy(c, 0, out, i * dim, dim)
      }
      out
    }
    if (sample.length < nCells) padded(Array(new Array[Double](dim)))
    else padded(lloyds(sample, nCells, seed))
  }

  /** Driver-local Lloyd's over the bounded sample: k-means++ seeding,
    * fixed iteration cap, empty cells re-seeded to the farthest point.
    * Deterministic given (sample order, seed). */
  private def lloyds(points: Array[Array[Double]], k: Int, seed: Long,
                     maxIter: Int = 20): Array[Array[Double]] = {
    val n = points.length
    val dim = points(0).length
    val rnd = new java.util.Random(seed)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    // k-means++ seeding
    val centers = Array.ofDim[Array[Double]](k)
    centers(0) = points(rnd.nextInt(n)).clone()
    val minD2 = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var i = 0; var total = 0.0
      while (i < n) {
        val d = d2(points(i), centers(c - 1))
        if (d < minD2(i)) minD2(i) = d
        total += minD2(i); i += 1
      }
      var pick = rnd.nextDouble() * total
      var j = 0
      while (j < n - 1 && pick > minD2(j)) { pick -= minD2(j); j += 1 }
      centers(c) = points(j).clone()
      c += 1
    }
    val assign = Array.fill(n)(-1)
    var iter = 0; var moved = true
    while (iter < maxIter && moved) {
      moved = false
      var i = 0
      while (i < n) {
        var best = 0; var bestD = d2(points(i), centers(0)); var cc = 1
        while (cc < k) {
          val d = d2(points(i), centers(cc))
          if (d < bestD) { bestD = d; best = cc }
          cc += 1
        }
        if (assign(i) != best) { assign(i) = best; moved = true }
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      i = 0
      while (i < n) {
        val a = assign(i); counts(a) += 1
        var j = 0
        while (j < dim) { sums(a)(j) += points(i)(j); j += 1 }
        i += 1
      }
      // re-seed empty cells to the farthest points from their current
      // centers, each empty cell taking a DISTINCT point — re-running
      // the same argmax per cell would hand every empty cell the same
      // point and collapse them into duplicate centroids
      val reseeded = new java.util.HashSet[Integer]()
      var cc = 0
      while (cc < k) {
        if (counts(cc) == 0) {
          var far = -1; var farD = -1.0; var ii = 0
          while (ii < n) {
            if (!reseeded.contains(ii)) {
              val d = d2(points(ii), centers(assign(ii)))
              if (d > farD) { farD = d; far = ii }
            }
            ii += 1
          }
          if (far < 0) far = 0 // degenerate: fewer points than empty cells
          reseeded.add(far)
          centers(cc) = points(far).clone()
          moved = true
        } else {
          var j = 0
          while (j < dim) { sums(cc)(j) /= counts(cc); j += 1 }
          centers(cc) = sums(cc)
        }
        cc += 1
      }
      iter += 1
    }
    centers
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nCells: Int, nProbe: Int,
              dim: Int, centroids: Array[Double],
              idCol: String = "vec_id", vecCol: String = "embedding",
              queryIdCol: String = "query_id"): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells, "nProbe in [1, nCells]")
    require(centroids.length == nCells * dim,
      s"centroid array length ${centroids.length} != nCells*dim ${nCells * dim}")
    val spark = corpus.sparkSession
    val cb = corpus.withColumn("__cell",
      element_at(HashExprs.nearestCells(spark, col(vecCol), centroids, nCells, dim, 1), 1))
    val qb = queries
      .select(col(queryIdCol), col(vecCol).as("__q_vec"))
      .withColumn("__cell",
        explode(HashExprs.nearestCells(spark, col("__q_vec"), centroids, nCells, dim, nProbe)))
    rerank(cb.join(qb, "__cell"), k, idCol, queryIdCol, vecCol)
  }

  /** Product-quantization codebooks — the third index family next to
    * SRP-LSH and IVF, and the one that changes the MEMORY story: each
    * corpus vector compresses to `m` small codes (m=8, k=16 → 8 ints
    * standing in for 64 floats), so a 100 TB embedding column's search
    * index fits in cluster RAM and candidate scoring never touches the
    * raw vectors.
    *
    * Training follows the same fit-on-a-bounded-sample recipe as
    * [[ivfCentroids]] (deterministic lowest-id sample, driver-local
    * Lloyd's per SUBSPACE with per-subspace seeds) — flat cost in corpus
    * size. Vectors are L2-normalized before chunking so the ADC score
    * approximates COSINE directly. Returns flat [m][k][dim/m].
    */
  def pqCodebooks(corpus: DataFrame, m: Int, k: Int, dim: Int,
                  vecCol: String = "embedding", seed: Long = 42L,
                  maxSample: Int = 4096, idCol: String = "vec_id"): Array[Double] = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val dsub = dim / m
    val sample: Array[Array[Double]] = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull && size(col("v")) === dim)
      .orderBy(col(idCol))
      .limit(maxSample)
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        var n2 = 0.0; var i = 0
        while (i < dim) { n2 += v(i) * v(i); i += 1 }
        val inv = if (n2 > 0) 1.0 / math.sqrt(n2) else 0.0
        i = 0
        while (i < dim) { v(i) *= inv; i += 1 }
        v
      }
    val out = new Array[Double](m * k * dsub)
    // degenerate corpus: zero codebooks → every code 0, ADC score 0 —
    // search degrades to id-ordered candidates, still well-defined
    if (sample.length >= k) {
      var j = 0
      while (j < m) {
        val sub = sample.map(_.slice(j * dsub, (j + 1) * dsub))
        val centers = lloyds(sub, k, seed + j)
        var c = 0
        while (c < k) {
          System.arraycopy(centers(c), 0, out, (j * k + c) * dsub, dsub)
          c += 1
        }
        j += 1
      }
    }
    out
  }

  /** PQ ANN top-k with exact re-rank: encode the corpus to codes (narrow
    * map, no shuffle), broadcast the queries with their per-query ADC
    * lookup tables, walk the table for an O(m) approximate score per
    * candidate, keep the top-`shortlist` per query, then exact-cosine
    * re-rank only the shortlist. Emitted `sim` values are TRUE cosines
    * (the PQ approximation only chooses the shortlist — same contract as
    * every other ANN tier here: approximation bounds recall, never
    * fabricates similarity). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int, kCodes: Int,
             dim: Int, codebooks: Array[Double], shortlist: Int = 32,
             idCol: String = "vec_id", vecCol: String = "embedding",
             queryIdCol: String = "query_id"): DataFrame = {
    require(codebooks.length == m * kCodes * (dim / m),
      s"codebook length ${codebooks.length} != m*k*dsub ${m * kCodes * (dim / m)}")
    val spark = corpus.sparkSession
    // codes only — the ADC scan and its per-query top-shortlist window
    // shuffle (id, query_id, score) rows, never the raw vectors
    val enc = corpus.select(col(idCol),
      HashExprs.pqEncode(spark, col(vecCol), codebooks, m, kCodes, dim).as("__codes"))
    val qt = queries
      .select(col(queryIdCol),
        HashExprs.pqTable(spark, col(vecCol), codebooks, m, kCodes, dim).as("__table"))
    val wAdc = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__adc").desc, col(idCol).asc)
    val short = enc.crossJoin(broadcast(qt))
      .withColumn("__adc", HashExprs.adcScore(spark, col("__codes"), col("__table"), kCodes))
      .filter(col(idCol) =!= col(queryIdCol))
      .select(col(idCol), col(queryIdCol), col("__adc"))
      .withColumn("__arnk", row_number().over(wAdc)) // plans as WindowGroupLimit
      .filter(col("__arnk") <= shortlist)
      .select(col(idCol), col(queryIdCol))
    // raw vectors rejoin only for the |queries|·shortlist survivors
    val withVecs = short
      .join(corpus.select(col(idCol), col(vecCol)), idCol)
      .join(broadcast(queries.select(col(queryIdCol), col(vecCol).as("__q_vec"))), queryIdCol)
    rerank(withVecs, k, idCol, queryIdCol, vecCol)
  }

  /** Embedding-cosine near-duplicate pairs — the embedding member of the
    * dedup family (exact / MinHash / SimHash / n-gram Jaccard /
    * embedding-cosine): unordered pairs (id_a < id_b) with exact cosine
    * ≥ `threshold`. Candidate generation is an SRP-LSH SELF-join: one
    * side sits in its home bucket, the other probes its home bucket plus
    * `nProbe−1` single-bit flips, so a pair becomes a candidate when the
    * sign signatures are EQUAL, or differ in exactly one of the probed
    * low bits (Hamming distance ≤ 1 within bits 0..nProbe−2 — not any
    * combination of probed bits). Exact cosine then verifies every
    * candidate — output pairs are never false positives, LSH only bounds
    * recall (tune `bits` down / `nProbe` up to raise it). Shuffle volume
    * is |corpus|·nProbe rows + in-bucket pairs — never the all-pairs
    * cross product. */
  def cosineNearDups(corpus: DataFrame, threshold: Double, bits: Int, dim: Int,
                     nProbe: Int = 1, idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     maxBucketSize: Int = 100000): DataFrame = {
    val spark = corpus.sparkSession
    // skew guard, applied to BOTH sides by excluding mega-bucket MEMBERS
    // from the operator entirely: a one-sided drop would still let a
    // million boilerplate rows probe their neighbor buckets (quadratic on
    // one key), and an asymmetric drop + the id_a < id_b filter would
    // lose pairs whose higher id happens to live in the hot bucket.
    // Excluded members are near-identical boilerplate that exact dedup
    // collapses; everything in sane buckets keeps symmetric coverage.
    val withHome = corpus
      .select(col(idCol), col(vecCol))
      .withColumn("__home", HashExprs.srpBucket(spark, col(vecCol), bits, dim))
    val sane = withHome.groupBy("__home").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucketSize).select("__home")
    val bounded = withHome.join(sane, Seq("__home"), "left_semi")
    val home = bounded.select(col(idCol).as("id_b"), col(vecCol).as("__vec_b"),
      col("__home").as("__bucket"))
    val probing = withProbedBuckets(
      bounded.select(col(idCol).as("id_a"), col(vecCol).as("__vec_a")),
      "__vec_a", bits, dim, nProbe)
    probing.join(home, "__bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", HashExprs.cosine(spark, col("__vec_a"), col("__vec_b")))
      .filter(col("sim") >= threshold)
      // same pair can collide via several probed buckets — dedup LAST, so
      // the shuffle carries only the pairs that survived the threshold
      // (a pre-verify dropDuplicates would shuffle every candidate with
      // both embedding payloads attached; recomputing a duplicate's
      // cosine in codegen is far cheaper)
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Dedup by embedding similarity: drop the HIGHER id of every near-dup
    * pair — the keep-lowest-id policy the exact and MinHash dedups use.
    * Anti join against the (distinct) drop set; linear. */
  def dedupByEmbedding(corpus: DataFrame, threshold: Double, bits: Int, dim: Int,
                       nProbe: Int = 1, idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val drop = cosineNearDups(corpus, threshold, bits, dim, nProbe, idCol, vecCol)
      .select(col("id_b").as(idCol)).distinct()
    corpus.join(drop, Seq(idCol), "left_anti")
  }

  /** Persist an IVF index as a CELL-PARTITIONED parquet table: each
    * vector stored under its nearest-centroid cell directory. Search then
    * reads ONLY the probed cells via static partition pruning — at 100 TB
    * the scan I/O per query batch is nProbe/nCells of the corpus, decided
    * by the file listing, not by filtering rows after reading them. The
    * centroids array is the index metadata; persist it alongside (it is
    * nCells·dim doubles — trivially small). */
  def writeIvfIndex(corpus: DataFrame, path: String, nCells: Int, dim: Int,
                    centroids: Array[Double], vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    // STATIC overwrite, deliberately: an index write is a full REBUILD
    // under new centroids, so every previous cell directory must go —
    // dynamic overwrite would leave cells the new build doesn't populate
    // holding stale vectors that searches would silently return
    corpus
      .withColumn("__cell",
        element_at(HashExprs.nearestCells(spark, col(vecCol), centroids, nCells, dim, 1), 1))
      .repartition(col("__cell"))
      .write
      .partitionBy("__cell")
      .mode("overwrite")
      .parquet(path)
  }

  /** ANN search against a persisted IVF index: compute each query's
    * probed cells, read only those partitions (the `isin` predicate is a
    * static partition filter), exact-cosine re-rank inside. The probed
    * cell set is O(|queries|·nProbe) distinct values — tiny — and is the
    * same driver-side move the incremental merge makes with touched
    * dates. */
  def searchIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, k: Int, nCells: Int, nProbe: Int, dim: Int,
                     centroids: Array[Double],
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     queryIdCol: String = "query_id"): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells, "nProbe in [1, nCells]")
    // evaluate the (tiny, by this API's contract) query side ONCE: the
    // collect below both derives the partition predicate and feeds the
    // join, so a nondeterministic queries frame can never probe cells at
    // join time that the scan was already pruned away from
    val qRows = queries
      .select(col(queryIdCol), col(vecCol).as("__q_vec"))
      .withColumn("__cell",
        explode(HashExprs.nearestCells(spark, col("__q_vec"), centroids, nCells, dim, nProbe)))
      .collect()
    val qSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(queryIdCol,
        queries.schema(queryIdCol).dataType, nullable = true),
      org.apache.spark.sql.types.StructField("__q_vec",
        queries.schema(vecCol).dataType, nullable = true),
      org.apache.spark.sql.types.StructField("__cell",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    val qb = spark.createDataFrame(
      java.util.Arrays.asList(qRows: _*), qSchema)
    val probedCells = qRows.map(_.getAs[Number]("__cell").longValue()).distinct
    val cb = spark.read.parquet(path)
      .where(col("__cell").isin(probedCells.map(c => lit(c)): _*))
    rerank(cb.join(broadcast(qb), "__cell"), k, idCol, queryIdCol, vecCol)
  }

  /** Per-cell residual PQ codebooks — the quantizer half of the
    * composed IVF-PQ index (Jégou et al., the standard 100 TB ANN
    * layout): coarse IVF cells bound the scan, and inside each cell the
    * vectors compress to m residual codes against that CELL's own
    * codebooks, so the in-cell candidate scan is an O(m) table walk
    * over codes that fit in cluster RAM — the raw vectors are touched
    * only by the exact re-rank of the shortlist.
    *
    * Training follows the bounded-sample recipe of [[ivfCentroids]] /
    * [[pqCodebooks]] (deterministic lowest-id sample, driver-local
    * Lloyd's, flat cost in corpus size): each sample vector is assigned
    * its coarse cell with EXACTLY the raw-space L2 argmin the encode
    * expression uses, residuals are normalized(v) − centroid[cell], and
    * each cell with ≥ kCodes sample residuals trains per-subspace
    * codebooks (seeded per (cell, subspace)); thinner cells keep zero
    * codebooks — their ADC scores collapse to the cell base term and
    * the exact re-rank still orders them correctly (the library-wide
    * ANN contract: approximation bounds recall, never fabricates
    * similarity). Driver state: nCells·m·kCodes·(dim/m) doubles —
    * bounded by the model configuration, never the corpus.
    *
    * Returns flat [nCells][m][kCodes][dim/m]. */
  def ivfPqCodebooks(corpus: DataFrame, nCells: Int, dim: Int, m: Int,
                     kCodes: Int, centroids: Array[Double],
                     vecCol: String = "embedding", seed: Long = 42L,
                     maxSample: Int = 4096,
                     idCol: String = "vec_id"): Array[Double] = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    require(centroids.length == nCells * dim,
      s"centroid array length ${centroids.length} != nCells*dim ${nCells * dim}")
    val dsub = dim / m
    val sample: Array[Array[Double]] = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull && size(col("v")) === dim)
      .orderBy(col(idCol))
      .limit(maxSample)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    def cellOf(v: Array[Double]): Int = {
      var bestC = -1; var bestD = Double.MaxValue; var c = 0
      while (c < nCells) {
        var s = 0.0; var j = 0; val off = c * dim
        while (j < dim) { val d = v(j) - centroids(off + j); s += d * d; j += 1 }
        if (bestC < 0 || s < bestD) { bestD = s; bestC = c }
        c += 1
      }
      bestC
    }
    val residualsByCell = new Array[scala.collection.mutable.ArrayBuffer[Array[Double]]](nCells)
    var i = 0
    while (i < nCells) {
      residualsByCell(i) = scala.collection.mutable.ArrayBuffer.empty
      i += 1
    }
    sample.foreach { v =>
      val cell = cellOf(v)
      var n2 = 0.0; var j = 0
      while (j < dim) { n2 += v(j) * v(j); j += 1 }
      val inv = if (n2 > 0) 1.0 / math.sqrt(n2) else 0.0
      val r = new Array[Double](dim)
      j = 0
      while (j < dim) { r(j) = v(j) * inv - centroids(cell * dim + j); j += 1 }
      residualsByCell(cell) += r
    }
    val out = new Array[Double](nCells * m * kCodes * dsub)
    var cell = 0
    while (cell < nCells) {
      val rs = residualsByCell(cell).toArray
      if (rs.length >= kCodes) {
        var j = 0
        while (j < m) {
          val sub = rs.map(_.slice(j * dsub, (j + 1) * dsub))
          val centers = lloyds(sub, kCodes, seed + cell.toLong * 31 + j)
          var c = 0
          while (c < kCodes) {
            System.arraycopy(centers(c), 0, out,
              (cell * m * kCodes + j * kCodes + c) * dsub, dsub)
            c += 1
          }
          j += 1
        }
      }
      cell += 1
    }
    out
  }

  /** IVF-PQ ANN top-k, in-memory: coarse cells prune the candidate set
    * (only probed cells join), per-cell residual ADC picks the
    * shortlist, exact cosine re-ranks it. Candidate estimates carry the
    * cell base term (q̂·centroid), so scores are comparable ACROSS
    * probed cells — the composed index never ranks cell-locally.
    * Emitted `sim` values are TRUE cosines (the ANN-tier contract). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int, nCells: Int,
                nProbe: Int, m: Int, kCodes: Int, dim: Int,
                centroids: Array[Double], codebooks: Array[Double],
                shortlist: Int = 32, idCol: String = "vec_id",
                vecCol: String = "embedding",
                queryIdCol: String = "query_id"): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells, "nProbe in [1, nCells]")
    val spark = corpus.sparkSession
    val enc = corpus.select(col(idCol), col(vecCol),
        HashExprs.ivfPqEncode(spark, col(vecCol), centroids, codebooks,
          nCells, m, kCodes, dim).as("__enc"))
      .select(col(idCol), col(vecCol),
        element_at(col("__enc"), 1).as("__cell"),
        slice(col("__enc"), 2, m).as("__codes"))
    val qb = queries
      .select(col(queryIdCol), col(vecCol).as("__q_vec"))
      .withColumn("__cell",
        explode(HashExprs.nearestCells(spark, col("__q_vec"), centroids,
          nCells, dim, nProbe)))
      .withColumn("__table",
        HashExprs.ivfPqTable(spark, col("__q_vec"), col("__cell"),
          centroids, codebooks, m, kCodes, dim))
    shortlistAndRerank(enc, qb, k, m, kCodes, shortlist, idCol, vecCol,
      queryIdCol)
  }

  /** Shared IVF-PQ scoring tail: ADC estimate (base term + table walk)
    * per candidate in a probed cell, per-query top-`shortlist`
    * (WindowGroupLimit), exact-cosine re-rank of the survivors. */
  private def shortlistAndRerank(enc: DataFrame, qb: DataFrame, k: Int,
                                 m: Int, kCodes: Int, shortlist: Int,
                                 idCol: String, vecCol: String,
                                 queryIdCol: String): DataFrame = {
    val spark = enc.sparkSession
    val wAdc = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__est").desc, col(idCol).asc)
    val short = enc.join(broadcast(qb), "__cell")
      .withColumn("__est",
        HashExprs.adcScore(spark, col("__codes"), col("__table"), kCodes) +
          element_at(col("__table"), m * kCodes + 1))
      .filter(col(idCol) =!= col(queryIdCol))
      .withColumn("__arnk", row_number().over(wAdc))
      .filter(col("__arnk") <= shortlist)
      .select(col(idCol), col(vecCol), col(queryIdCol), col("__q_vec"))
    rerank(short, k, idCol, queryIdCol, vecCol)
  }

  /** Persist an IVF-PQ index as a CELL-PARTITIONED parquet table — the
    * composed layout [[writeIvfIndex]]'s scaladoc queues: probed-cell
    * partition pruning bounds the scan I/O, and within each cell the
    * ADC scan reads ONLY the (id, codes) columns (column pruning), so
    * the per-query candidate pass touches m ints per vector; the raw
    * embedding column is read just for the shortlist re-rank join. The
    * fitted model (centroids + per-cell codebooks) persists alongside
    * under `__model` — an underscore directory, hidden from the
    * partitioned data listing but directly readable, so the index is
    * SELF-CONTAINED: any session can search it from the path alone.
    * Same static-overwrite posture as [[writeIvfIndex]]: an index write
    * is a full rebuild. */
  def writeIvfPqIndex(corpus: DataFrame, path: String, nCells: Int,
                      dim: Int, m: Int, kCodes: Int,
                      centroids: Array[Double], codebooks: Array[Double],
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    corpus
      .select(col(idCol), col(vecCol),
        HashExprs.ivfPqEncode(spark, col(vecCol), centroids, codebooks,
          nCells, m, kCodes, dim).as("__enc"))
      .select(col(idCol), col(vecCol),
        element_at(col("__enc"), 1).as("__cell"),
        slice(col("__enc"), 2, m).as("__codes"))
      .repartition(col("__cell"))
      .write
      .partitionBy("__cell")
      .mode("overwrite")
      .parquet(path)
    import spark.implicits._
    Seq((nCells, dim, m, kCodes, centroids.toSeq, codebooks.toSeq))
      .toDF("n_cells", "dim", "m", "k_codes", "centroids", "codebooks")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/__model")
  }

  /** INCREMENTAL IVF-PQ admission — index maintenance without the
    * O(corpus) rebuild (the [[graft.operators.IncrementalDedup]] move,
    * ANN edition): new vectors encode under the index's OWN persisted
    * model (same centroids, same per-cell codebooks — so their cells,
    * codes, and every downstream ADC estimate are exactly what a full
    * rebuild would assign) and land as NEW files appended into their
    * cell directories; existing files are never touched. Search over
    * the appended index is therefore BIT-IDENTICAL to a full rebuild
    * over the union corpus under the same model — the q301 gate.
    *
    * Cost: O(batch) encode + write, vs O(corpus) for a rebuild. What
    * it does NOT do: re-train (centroid/codebook drift against a
    * growing corpus is the [[indexStaleness]] audit's question —
    * re-train + [[writeIvfPqIndex]] when recall sags against its
    * reachable ceiling), dedup (admitting the same vec_id twice stores
    * it twice — gate admission upstream, e.g. via the incremental
    * dedup sink), or transactional atomicity (a crash mid-append can
    * leave a partial batch; wrap the call in [[graft.sources
    * .TxnParquet]]-style staging if replays aren't idempotent for the
    * caller). */
  def appendToIvfPqIndex(newVectors: DataFrame, path: String,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): Unit = {
    val spark = newVectors.sparkSession
    requireIndexPath(spark, path, "IVF-PQ")
    val model = spark.read.parquet(s"$path/__model").collect().head
    val nCells = model.getAs[Int]("n_cells")
    val dim = model.getAs[Int]("dim")
    val m = model.getAs[Int]("m")
    val kCodes = model.getAs[Int]("k_codes")
    val centroids = model.getSeq[Double](model.fieldIndex("centroids")).toArray
    val codebooks = model.getSeq[Double](model.fieldIndex("codebooks")).toArray
    newVectors
      .select(col(idCol), col(vecCol),
        HashExprs.ivfPqEncode(spark, col(vecCol), centroids, codebooks,
          nCells, m, kCodes, dim).as("__enc"))
      .select(col(idCol), col(vecCol),
        element_at(col("__enc"), 1).as("__cell"),
        slice(col("__enc"), 2, m).as("__codes"))
      .repartition(col("__cell"))
      .write
      .partitionBy("__cell")
      .mode("append")
      .parquet(path)
  }

  /** Per-cell BIN-PACK compaction for an appended IVF-PQ index — the
    * maintenance half of [[appendToIvfPqIndex]]'s contract: every
    * append lands one new file per touched cell, so under streaming
    * admission a cell directory grows one file per batch without bound,
    * and at scale file COUNT (listing pressure, one scan task per tiny
    * file) degrades the probed-cell read long before data volume does.
    *
    * Rewrites ONLY the cells holding more than `maxFilesPerCell` data
    * files — one task → one file per compacted cell — via dynamic
    * partition overwrite, so healthy cells and the `__model` dir are
    * untouched and the self-read is safe (commit-time swap, the
    * [[graft.weather.Store.compactFact]] pattern). Search results are
    * BIT-IDENTICAL across compaction: rows and model unchanged, only
    * file layout differs (IvfPqCompactionSpec). Returns the compacted
    * cell ids; run it on the batch cadence, it is O(selected cells'
    * bytes), never O(index).
    *
    * Compaction does NOT cure model staleness — when [[indexStaleness]]
    * shows recall sagging against its reachable ceiling, re-train and
    * [[writeIvfPqIndex]] (O(corpus), the deliberate rebuild). */
  def compactIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String, maxFilesPerCell: Int = 8): Seq[Int] = {
    require(maxFilesPerCell >= 1, "maxFilesPerCell must be >= 1")
    requireIndexPath(spark, path, "IVF-PQ")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val offenders = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__cell="))
      .filter { dir =>
        fs.listStatus(dir.getPath).count { f =>
          f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith(".")
        } > maxFilesPerCell
      }
      .map(_.getPath.getName.stripPrefix("__cell=").toInt)
    if (offenders.isEmpty) return Nil
    spark.read.parquet(path)
      .where(col("__cell").isin(offenders.map(c => lit(c)): _*))
      .repartition(col("__cell")) // one task → one file per compacted cell
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__cell")
      .mode("overwrite")
      .parquet(path)
    offenders
  }

  /** ANN search against a persisted IVF-PQ index: load the model row,
    * compute each query's probed cells, read ONLY those partitions
    * (static partition filter), residual-ADC shortlist, exact re-rank.
    * Bit-identical to [[ivfPqTopK]] on the same corpus/model — the
    * persisted path changes where candidates are READ, never how they
    * are scored. Missing-path / empty-snapshot discipline follows
    * [[searchLshIndex]]. */
  def searchIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String, queries: DataFrame, k: Int,
                       nProbe: Int, shortlist: Int = 32,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       queryIdCol: String = "query_id"): DataFrame = {
    requireIndexPath(spark, path, "IVF-PQ")
    val model = spark.read.parquet(s"$path/__model").collect().head
    val nCells = model.getAs[Int]("n_cells")
    val dim = model.getAs[Int]("dim")
    val m = model.getAs[Int]("m")
    val kCodes = model.getAs[Int]("k_codes")
    val centroids = model.getSeq[Double](model.fieldIndex("centroids")).toArray
    val codebooks = model.getSeq[Double](model.fieldIndex("codebooks")).toArray
    require(nProbe >= 1 && nProbe <= nCells, "nProbe in [1, nCells]")
    // evaluate the (tiny, by contract) query side ONCE — the collect
    // feeds both the partition predicate and the join (searchIvfIndex's
    // nondeterminism discipline)
    val qRows = queries
      .select(col(queryIdCol), col(vecCol).as("__q_vec"))
      .withColumn("__cell",
        explode(HashExprs.nearestCells(spark, col("__q_vec"), centroids,
          nCells, dim, nProbe)))
      .collect()
    val qSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(queryIdCol,
        queries.schema(queryIdCol).dataType, nullable = true),
      org.apache.spark.sql.types.StructField("__q_vec",
        queries.schema(vecCol).dataType, nullable = true),
      org.apache.spark.sql.types.StructField("__cell",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    val qb = spark.createDataFrame(
        java.util.Arrays.asList(qRows: _*), qSchema)
      .withColumn("__table",
        HashExprs.ivfPqTable(spark, col("__q_vec"), col("__cell"),
          centroids, codebooks, m, kCodes, dim))
    val probedCells = qRows.map(_.getAs[Number]("__cell").longValue()).distinct
    if (!graft.sources.FsUtil.hasData(spark, path))
      return emptyTopK(spark, queries, queryIdCol, idCol)
    val enc = spark.read.parquet(path)
      .where(col("__cell").isin(probedCells.map(c => lit(c)): _*))
    shortlistAndRerank(enc, broadcast(qb), k, m, kCodes, shortlist,
      idCol, vecCol, queryIdCol)
  }

  /** Persist an SRP-LSH index as a BUCKET-PARTITIONED parquet table —
    * [[writeIvfIndex]]'s sibling for the hyperplane family: each vector
    * stored under its sign-pattern bucket directory, so a search batch
    * reads ONLY its probed buckets via static partition pruning
    * (nProbe·|queries| distinct directories out of 2^bits — at 100 TB
    * the scan I/O is decided by the file listing, never by filtering
    * rows after reading them). No trained metadata to persist: the SRP
    * planes are seeded, so any session reconstructs the identical
    * bucketing from (bits, dim) alone — that determinism is also what
    * makes [[searchLshIndex]] bit-identical to the in-memory
    * [[lshTopKMultiProbe]] on the same corpus. Same static-overwrite
    * posture as IVF: an index write is a full rebuild. */
  def writeLshIndex(corpus: DataFrame, path: String, bits: Int, dim: Int,
                    vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    corpus
      .withColumn("__bucket",
        HashExprs.srpBucket(spark, col(vecCol), bits, dim))
      .repartition(col("__bucket"))
      .write
      .partitionBy("__bucket")
      .mode("overwrite")
      .parquet(path)
  }

  /** Multi-probe ANN search against a persisted SRP-LSH index: each
    * query's home bucket + its nProbe−1 single-bit flips become a
    * static partition filter on the index scan; exact-cosine re-rank
    * inside, exactly [[lshTopKMultiProbe]]'s semantics — the gate
    * asserts result EQUALITY with the in-memory path (same seeded
    * planes ⇒ same buckets ⇒ same candidates ⇒ same ranks). The query
    * side is collected ONCE (tiny by contract) so the partition
    * predicate and the join see the same probed set — the
    * [[searchIvfIndex]] discipline. */
  def searchLshIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, k: Int, bits: Int, dim: Int,
                     nProbe: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     queryIdCol: String = "query_id"): DataFrame = {
    val qRows = withProbedBuckets(
      queries.select(col(queryIdCol), col(vecCol).as("__q_vec")),
      "__q_vec", bits, dim, nProbe).collect()
    val qSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(queryIdCol,
        queries.schema(queryIdCol).dataType, nullable = true),
      org.apache.spark.sql.types.StructField("__q_vec",
        queries.schema(vecCol).dataType, nullable = true),
      org.apache.spark.sql.types.StructField("__bucket",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val qb = spark.createDataFrame(
      java.util.Arrays.asList(qRows: _*), qSchema)
    val probed = qRows.map(_.getAs[Number]("__bucket").longValue()).distinct
    // an EMPTY corpus writes a partitioned dir with no part files, which
    // parquet cannot infer a schema from — the honest result there is an
    // empty top-k frame. ONLY that case maps to empty (requireIndexPath
    // makes a mistyped path fail loudly), and any other read failure
    // propagates — catching every AnalysisException here would make a
    // broken index indistinguishable from an empty one
    requireIndexPath(spark, path, "LSH")
    if (!graft.sources.FsUtil.hasData(spark, path))
      return emptyTopK(spark, queries, queryIdCol, idCol)
    val cb = spark.read.parquet(path)
    rerank(cb.where(col("__bucket").isin(probed.map(b => lit(b)): _*))
      .join(broadcast(qb), "__bucket"), k, idCol, queryIdCol, vecCol)
  }

  /** INT8 symmetric quantization audit — the storage/serving question
    * every embedding pipeline answers before shipping vectors at 100 TB
    * scale: per-vector symmetric int8 (scale = max|x|/127, q =
    * round(x/scale) clamped) cuts the column 4×; this reports exactly
    * what that costs, per vector. Every output is ENGINE-EXACT: the
    * scale and each reconstruction error are single IEEE op chains over
    * the float inputs, published as floor(x·10⁹ + 0.5) nano-integers,
    * and the per-vector error SUM accumulates in those integers — no
    * float-summation order anywhere, so DuckDB replays it bitwise (the
    * value-oracle counterpart to the ANN tier's invariant gates).
    *
    * Zero vectors quantize to all-zero with zero error (scale 0 is a
    * published fact, not a division). `n_clipped` counts elements at
    * the ±127 rail — with a max-derived scale that's exactly the
    * max-magnitude elements, so a value > dim signals NaN/Inf input.
    *
    * Shape: one narrow projection (per-row HOF chain), no shuffle; the
    * presentation sort is the only exchange. Output: `vec_id`,
    * `scale_nano`, `n_clipped` (elements at ±127), `max_err_nano`,
    * `sum_err_nano` LONG — total order by vec_id. */
  def quantizationAudit(corpus: DataFrame, idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    corpus
      .select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<double>").as("__v"))
      .filter(col("vec_id").isNotNull && col("__v").isNotNull)
      .withColumn("__scale",
        expr("aggregate(__v, CAST(0.0 AS DOUBLE), (m, x) -> " +
          "greatest(m, abs(x))) / 127.0"))
      .withColumn("__q", expr(
        "transform(__v, x -> CASE WHEN __scale = 0.0 THEN 0L ELSE " +
          "greatest(-127L, least(127L, " +
          "CAST(floor(x / __scale + 0.5) AS BIGINT))) END)"))
      .withColumn("__err_nano", expr(
        "zip_with(__v, __q, (x, q) -> " +
          "CAST(floor(abs(x - q * __scale) * 1000000000.0 + 0.5) " +
          "AS BIGINT))"))
      .select(col("vec_id"),
        expr("CAST(floor(__scale * 1000000000.0 + 0.5) AS BIGINT)")
          .as("scale_nano"),
        expr("CAST(size(filter(__q, q -> q = 127L OR q = -127L)) " +
          "AS BIGINT)").as("n_clipped"),
        expr("CAST(array_max(__err_nano) AS BIGINT)").as("max_err_nano"),
        expr("CAST(aggregate(__err_nano, 0L, (a, e) -> a + e) AS BIGINT)")
          .as("sum_err_nano"))
      .orderBy("vec_id")
  }

  /** ANN HARD-NEGATIVE MINING — the contrastive-training data op: for
    * each query vector, the k most similar vectors carrying a DIFFERENT
    * label (the "hard negatives" that teach a model the decision
    * boundary; random negatives are trivially separable). The label
    * filter applies BEFORE the top-k cut — filtering an unconstrained
    * top-k afterwards silently under-fills exactly when negatives are
    * hardest to find.
    *
    * `exact = true`: brute-force truth (queries broadcast — the q25
    * contract). `exact = false`: SRP-LSH multi-probe candidates, same
    * filter, exact cosine re-rank — the 100 TB path; approximation
    * bounds recall, never fabricates similarity (emitted sims are true
    * cosines, the ANN-tier contract). Output: (`query_id`, `vec_id`,
    * `label`, `sim`, `rank`). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    labelCol: String, exact: Boolean, bits: Int = 0,
                    dim: Int = 0, nProbe: Int = 1,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    queryIdCol: String = "query_id"): DataFrame = {
    val spark = corpus.sparkSession
    val q = queries.select(col(queryIdCol), col(vecCol).as("__q_vec"),
      col(labelCol).as("__q_label"))
    val cands =
      if (exact) corpus.crossJoin(broadcast(q))
      else {
        require(bits > 0 && dim > 0, "LSH path needs bits and dim")
        val home = corpus.withColumn("__bucket",
          HashExprs.srpBucket(spark, col(vecCol), bits, dim))
        val probing = withProbedBuckets(q, "__q_vec", bits, dim, nProbe)
        home.join(broadcast(probing), "__bucket")
      }
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("sim").desc, col(idCol).asc)
    cands
      .filter(col(idCol) =!= col(queryIdCol) &&
        !(col(labelCol) <=> col("__q_label"))) // negatives only
      .withColumn("sim", HashExprs.cosine(spark, col(vecCol), col("__q_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col(labelCol).as("label"),
        col("sim"), col("rank"))
  }

  /** TRUNCATED-DIMENSION (matryoshka) recall audit — the dimension-
    * budget question for an embedding column at 100 TB: cutting vectors
    * to their first d dimensions cuts storage, scan I/O, and every
    * dot product proportionally; this measures exactly what recall@k
    * that costs, per candidate d. For each d, the exact top-k in the
    * TRUNCATED space is compared to the exact top-k in the full space;
    * recall is published as a truncating-ppm integer, so the whole
    * table is engine-exact (pinned cosine chains + integer set
    * intersection — a VALUE oracle, not an invariant gate). d = full
    * dim reproduces the full ranking identically (same ties, same
    * order), so its row reading 10⁶ is a built-in self-check.
    *
    * Shape: per d, one broadcast brute-force pass over the corpus (the
    * q25 contract — queries are bounded); the recall join touches only
    * |queries|·k pairs. Output: `dim`, `n_queries`, `n_pairs`,
    * `n_hits`, `recall_ppm` LONG — total order by dim. */
  def truncatedRecall(corpus: DataFrame, queries: DataFrame, k: Int,
                      dims: Seq[Int], fullDim: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      queryIdCol: String = "query_id"): DataFrame = {
    require(dims.nonEmpty && dims.forall(d => d >= 1 && d <= fullDim),
      s"dims must be within 1..$fullDim, got $dims")
    def topAt(d: Int): DataFrame = bruteForceTopK(
      corpus.select(col(idCol), slice(col(vecCol), 1, d).as(vecCol)),
      queries.select(col(queryIdCol), slice(col(vecCol), 1, d).as(vecCol)),
      k, idCol, vecCol, queryIdCol)
    val full = topAt(fullDim)
      .select(col(queryIdCol), col(idCol)).localCheckpoint(true)
    dims.map { d =>
      topAt(d)
        .join(full.withColumn("__hit", lit(1L)), Seq(queryIdCol, idCol),
          "left")
        .agg(countDistinct(col(queryIdCol)).as("n_queries"),
          count(lit(1)).as("n_pairs"),
          coalesce(sum(coalesce(col("__hit"), lit(0L))), lit(0L))
            .as("n_hits"))
        .select(lit(d.toLong).as("dim"), col("n_queries"), col("n_pairs"),
          col("n_hits"),
          expr("CASE WHEN n_pairs > 0 THEN (n_hits * 1000000L) " +
            "DIV n_pairs END").as("recall_ppm"))
    }.reduce(_ unionByName _).orderBy("dim")
  }

  /** Per-bucket occupancy stats for the LSH index — the operational view
    * of bucket skew (drives the bits/tables tuning). */
  /** Persisted-index STALENESS audit — the refresh-policy input every
    * long-lived ANN index needs: an index built at corpus snapshot T
    * silently degrades as new vectors arrive (they are simply absent
    * from its buckets), and "when do we rebuild" should be a measured
    * recall number, not a guess. For a bounded probe set, compares the
    * persisted [[writeLshIndex]] search against brute-force exact
    * top-k over the CURRENT corpus:
    *
    *   recall@k(stale)  vs  the share of each probe's true top-k that
    *   even EXISTS in the index snapshot (`reachable_ppm` — the
    *   structural ceiling: no bucket layout can return a vector it
    *   never indexed)
    *
    * — when recall ≈ ceiling, the index is as good as its snapshot
    * allows and the decision is purely about corpus growth; recall ≪
    * ceiling means bucket drift on top of missing data.
    *
    * Scale posture: probes are a bounded set (the q30/q225 contract);
    * exact truth is probes × corpus but bounded by |probes|; the index
    * search is the partition-pruned [[searchLshIndex]] path.
    *
    * Output (one row): `n_probes`, `k`, `n_true`, `n_hit`,
    * `recall_ppm`, `n_reachable`, `reachable_ppm` LONG.
    */
  def indexStaleness(spark: org.apache.spark.sql.SparkSession,
                     indexPath: String, corpus: DataFrame,
                     queries: DataFrame, k: Int, bits: Int,
                     dim: Int, nProbe: Int = 4): DataFrame = {
    val exact = bruteForceTopK(corpus, queries, k)
      .select(col("query_id"), col("vec_id").as("__true_id"))
    // an EMPTY snapshot writes a partitioned dir with no part files —
    // only THAT maps to "nothing is reachable" (the searchLshIndex
    // empty-corpus precedent). A missing/mistyped path fails loudly
    // instead of silently auditing as n_reachable=0, and any other
    // read failure propagates
    requireIndexPath(spark, indexPath, "LSH")
    val indexed = (if (graft.sources.FsUtil.hasData(spark, indexPath))
        spark.read.parquet(indexPath).select(col("vec_id").as("__ix_id"))
      else spark.range(0).select(col("id").as("__ix_id"))).distinct()
    val got = searchLshIndex(spark, indexPath, queries, k, bits, dim,
        nProbe)
      .select(col("query_id").as("__gq"), col("vec_id").as("__got_id"))
    exact
      .join(indexed, col("__true_id") === col("__ix_id"), "left_outer")
      .join(got, col("query_id") === col("__gq") &&
        col("__true_id") === col("__got_id"), "left_outer")
      .agg(
        countDistinct(col("query_id")).as("n_probes"),
        count(lit(1)).as("n_true"),
        coalesce(sum(when(col("__got_id").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("n_hit"),
        coalesce(sum(when(col("__ix_id").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("n_reachable"))
      .withColumn("k", lit(k.toLong))
      .withColumn("recall_ppm",
        when(col("n_true") > 0L, expr("(n_hit * 1000000L) DIV n_true")))
      .withColumn("reachable_ppm",
        when(col("n_true") > 0L,
          expr("(n_reachable * 1000000L) DIV n_true")))
      .select(col("n_probes"), col("k"), col("n_true"), col("n_hit"),
        col("recall_ppm"), col("n_reachable"), col("reachable_ppm"))
  }

  def lshBucketStats(corpus: DataFrame, bits: Int, dim: Int,
                     vecCol: String = "embedding"): DataFrame =
    corpus
      .withColumn("bucket", HashExprs.srpBucket(corpus.sparkSession, col(vecCol), bits, dim))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("bucket"))

  /** Margin-based kNN rescoring (the Artetxe–Schwenk ratio margin that
    * bitext/duplicate mining uses): raw cosine over-scores HUB vectors
    * (near-everything points that pollute every candidate list);
    * dividing by the mean similarity of each side's own neighborhood
    * normalizes it away:
    *
    *   margin(x,y) = cos(x,y) / ((penalty(x)+penalty(y)) / 2·kAvg)
    *
    * where penalty(v) = Σ cos(v, NNᵢ(v)) over v's top-`kAvg` corpus
    * neighbors. Penalties are INTEGER micro-unit sums (floor(cos·10⁶)
    * summed as longs — order-free, and the micro quantization is
    * engine-exact: measured bit-parity of all 124,750 pair micros vs
    * DuckDB), so the margin is one IEEE division of integers — fully
    * oracle-able, unlike a float mean whose summation order floats.
    *
    * Shape: one penalty pass over the corpus (self-kNN — brute force
    * here as the exact baseline; swap [[lshTopK]]/[[ivfTopK]] in for
    * the 100 TB path, penalties are computed ONCE and stored), then a
    * shortlist per query re-ranked by margin. Shortlist size bounds
    * how far margin can promote beyond raw-cosine rank (`shortlist` ≥
    * k·4 by default). Output: (query_id, vec_id, margin, rank). */
  def marginTopK(corpus: DataFrame, queries: DataFrame, k: Int, kAvg: Int,
                 shortlist: Int = 0,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 queryIdCol: String = "query_id"): DataFrame = {
    require(k >= 1 && kAvg >= 1, s"need k, kAvg >= 1; got ($k, $kAvg)")
    val sl = if (shortlist > 0) shortlist else math.max(k * 4, kAvg)
    val micro = (c: Column) => floor(c * 1000000L + 0.5).cast("long")

    val self = corpus.select(col(idCol).as(queryIdCol), col(vecCol))
    val pen = bruteForceTopK(corpus, self, kAvg, idCol, vecCol, queryIdCol)
      .groupBy(col(queryIdCol).as("__pid"))
      .agg(sum(micro(col("sim"))).as("__pen"))

    val base = bruteForceTopK(corpus, queries, sl, idCol, vecCol, queryIdCol)
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("margin").desc, col(idCol).asc)
    base
      .join(pen.select(col("__pid").as(queryIdCol), col("__pen").as("__pen_q")),
        queryIdCol)
      .join(pen.select(col("__pid").as(idCol), col("__pen").as("__pen_c")), idCol)
      .withColumn("margin",
        (micro(col("sim")) * (2L * kAvg)).cast("double") /
          (col("__pen_q") + col("__pen_c")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("margin"), col("rank"))
  }

  /** [[marginTopK]] on the ANN scale path: BOTH passes that made the
    * exact version quadratic — the corpus self-kNN penalty pass and the
    * per-query shortlist — come from multi-probe SRP-LSH bucket joins
    * instead of a broadcast cross join. Cost becomes the LSH bucket
    * economics (|corpus| rows into buckets, probe-factor joins), linear
    * in the corpus where the exact penalty pass was |corpus|²; this is
    * the composition the exact operator's scaladoc promises for 100 TB.
    *
    * Semantics shift with approximation, handled exactly:
    *  - an LSH self-kNN may find FEWER than `kAvg` neighbors for an
    *    isolated vector, so the fixed 2·kAvg normalizer would deflate
    *    its penalty and inflate its margins. The margin here uses the
    *    ACTUAL neighbor counts: with n_x found neighbors and integer
    *    micro penalties,
    *      margin(x,y) = 2·µ(cos)·n_x·n_y / (pen_x·n_y + pen_y·n_x)
    *    — algebraically cos / (mean_x + mean_y)/2 with true means, one
    *    IEEE division of exact integers (bounded: kAvg·10⁶ scale), so
    *    the rescoring stays engine-replayable given the candidate sets;
    *  - a corpus vector absent from the ANN penalty index (no neighbor
    *    found at all) cannot be margin-scored; those candidates are
    *    dropped rather than scored with a fabricated penalty — at sane
    *    `bits`/`nProbe` this is the empty set (spec-asserted recall).
    *
    * Determinism: given the same `bits`/`nProbe`/seeded SRP planes, the
    * candidate sets, penalties, and ranks are layout-independent.
    * Output: (query_id, vec_id, margin, rank) — the [[marginTopK]]
    * shape. */
  def marginTopKAnn(corpus: DataFrame, queries: DataFrame, k: Int, kAvg: Int,
                    bits: Int, dim: Int, nProbe: Int = 4, shortlist: Int = 0,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    queryIdCol: String = "query_id"): DataFrame = {
    require(k >= 1 && kAvg >= 1, s"need k, kAvg >= 1; got ($k, $kAvg)")
    val sl = if (shortlist > 0) shortlist else math.max(k * 4, kAvg)
    val micro = (c: Column) => floor(c * 1000000L + 0.5).cast("long")

    val self = corpus.select(col(idCol).as(queryIdCol), col(vecCol))
    val pen = lshTopKMultiProbe(corpus, self, kAvg, bits, dim, nProbe,
        idCol, vecCol, queryIdCol)
      .groupBy(col(queryIdCol).as("__pid"))
      .agg(sum(micro(col("sim"))).as("__pen"), count(lit(1)).as("__pn"))

    val base = lshTopKMultiProbe(corpus, queries, sl, bits, dim, nProbe,
      idCol, vecCol, queryIdCol)
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("margin").desc, col(idCol).asc)
    base
      .join(pen.select(col("__pid").as(queryIdCol),
        col("__pen").as("__pen_q"), col("__pn").as("__pn_q")), queryIdCol)
      .join(pen.select(col("__pid").as(idCol),
        col("__pen").as("__pen_c"), col("__pn").as("__pn_c")), idCol)
      .withColumn("margin",
        (micro(col("sim")) * 2L * col("__pn_q") * col("__pn_c")).cast("double") /
          (col("__pen_q") * col("__pn_c") + col("__pen_c") * col("__pn_q")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("margin"), col("rank"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein '98):
    * greedily pick `k` results that balance query relevance against
    * redundancy with what's already picked —
    * `score(c) = λ·sim(q,c) − (1−λ)·max_{s∈selected} sim(c,s)` —
    * the diversification pass between retrieval and a context window
    * (near-identical passages waste the budget).
    *
    * Engine-exact contract: similarities quantize to integer micro
    * units (`floor(sim·10⁶ + 0.5)`, the [[marginTopK]] convention,
    * measured bit-parity vs DuckDB), λ is ppm, so every greedy score
    * is the integer `λ_ppm·simq_µ − (10⁶−λ_ppm)·maxSel_µ` — no float
    * drift can flip a pick. First pick (empty selected set) scores
    * `λ_ppm·simq_µ`; ties break to the lowest id. Any engine replays
    * the selection exactly.
    *
    * Scale posture: MMR is inherently SEQUENTIAL per query, so the
    * greedy runs inside `cogroup` with per-group state O(S²) for a
    * shortlist of S — bounded and small (S defaults to 4k); the corpus
    * never enters the loop. Candidate generation is [[bruteForceTopK]]
    * here (exact baseline); swap [[lshTopK]]/[[ivfTopK]]/[[pqTopK]] in
    * front at 100 TB. Pairwise shortlist sims are one query-keyed
    * self-join through the codegen'd cosine — O(queries·S²) rows, all
    * distributed, no driver state.
    *
    * Output: (queryIdCol, idCol, mmr_rank, mmr_score_upm) where
    * `mmr_score_upm` is in micro·ppm units (divide by 10¹² for the
    * float score). Requires LONG ids on both sides.
    */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, k: Int,
                shortlist: Int = 0, lambdaPpm: Long = 700000L,
                idCol: String = "vec_id", vecCol: String = "embedding",
                queryIdCol: String = "query_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaPpm >= 0L && lambdaPpm <= 1000000L,
      s"lambdaPpm in [0, 1000000], got $lambdaPpm")
    val sl = if (shortlist > 0) shortlist else k * 4
    require(sl >= k, s"shortlist ($sl) must be >= k ($k)")
    val micro = (c: Column) => floor(c * 1000000L + 0.5).cast("long")
    val base = bruteForceTopK(corpus, queries, sl, idCol, vecCol, queryIdCol)
      .select(col(queryIdCol), col(idCol), micro(col("sim")).as("__simq"))
    mmrGreedy(corpus, base, k, lambdaPpm, idCol, vecCol, queryIdCol)
  }

  /** [[mmrRerank]] on the ANN scale path: the shortlist comes from a
    * multi-probe SRP-LSH bucket join ([[lshTopKMultiProbe]]) instead of
    * the broadcast cross join — the same candidate-stage swap that took
    * margin-kNN ([[marginTopKAnn]]) and rank-eval off their quadratic
    * baselines. Everything AFTER candidate generation is byte-identical
    * to the exact operator: shortlist pair cosines are still exact
    * codegen kernels (O(queries·S²), bounded by the shortlist), and the
    * greedy integer-µ selection replays engine-exactly given the same
    * candidate sets. An isolated query whose probed buckets hold fewer
    * than `shortlist` candidates just diversifies a shorter list — MMR
    * degrades to picking everything found, never fabricates candidates.
    * Determinism: fixed seeded SRP planes ⇒ layout-independent output.
    * Output: the [[mmrRerank]] shape. */
  def mmrRerankAnn(corpus: DataFrame, queries: DataFrame, k: Int,
                   bits: Int, dim: Int, nProbe: Int = 4,
                   shortlist: Int = 0, lambdaPpm: Long = 700000L,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   queryIdCol: String = "query_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaPpm >= 0L && lambdaPpm <= 1000000L,
      s"lambdaPpm in [0, 1000000], got $lambdaPpm")
    val sl = if (shortlist > 0) shortlist else k * 4
    require(sl >= k, s"shortlist ($sl) must be >= k ($k)")
    val micro = (c: Column) => floor(c * 1000000L + 0.5).cast("long")
    val base = lshTopKMultiProbe(corpus, queries, sl, bits, dim, nProbe,
        idCol, vecCol, queryIdCol)
      .select(col(queryIdCol), col(idCol), micro(col("sim")).as("__simq"))
    mmrGreedy(corpus, base, k, lambdaPpm, idCol, vecCol, queryIdCol)
  }

  /** Shared MMR tail: exact pairwise shortlist cosines + the per-query
    * sequential greedy inside cogroup. `base` carries (queryIdCol,
    * idCol, __simq µ-units); candidate-stage choice (exact vs ANN) is
    * the callers' only difference. */
  private def mmrGreedy(corpus: DataFrame, base: DataFrame, k: Int,
                        lambdaPpm: Long, idCol: String, vecCol: String,
                        queryIdCol: String): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val micro = (c: Column) => floor(c * 1000000L + 0.5).cast("long")

    // shortlist members' vectors, then all ordered pairs per query
    val vecs = base.select(col(queryIdCol), col(idCol))
      .join(corpus.select(col(idCol), col(vecCol)), idCol)
    val pa = vecs.select(col(queryIdCol), col(idCol).as("__a"), col(vecCol).as("__va"))
    val pb = vecs.select(col(queryIdCol), col(idCol).as("__b"), col(vecCol).as("__vb"))
    val pairs = pa.join(pb, Seq(queryIdCol))
      .filter(col("__a") < col("__b"))
      .select(col(queryIdCol), col("__a"), col("__b"),
        micro(HashExprs.cosine(spark, col("__va"), col("__vb"))).as("__m"))

    val candsDs = base.select(col(queryIdCol).cast("long"), col(idCol).cast("long"),
      col("__simq")).as[(Long, Long, Long)]
    val pairsDs = pairs.select(col(queryIdCol).cast("long"), col("__a"),
      col("__b"), col("__m")).as[(Long, Long, Long, Long)]

    val lam = lambdaPpm
    val kk = k
    candsDs.groupByKey(_._1).cogroup(pairsDs.groupByKey(_._1)) { (q, cs, ps) =>
      // ascending-id candidate order + strict > keeps ties on lowest id
      val cand = cs.map(t => (t._2, t._3)).toArray.sortBy(_._1)
      val sim = new java.util.HashMap[Long, java.util.HashMap[Long, Long]]()
      def put(a: Long, b: Long, m: Long): Unit = {
        var row = sim.get(a)
        if (row == null) { row = new java.util.HashMap[Long, Long](); sim.put(a, row) }
        row.put(b, m)
      }
      ps.foreach { case (_, a, b, m) => put(a, b, m); put(b, a, m) }
      val selected = new scala.collection.mutable.ArrayBuffer[Long](kk)
      val taken = new java.util.HashSet[Long]()
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)](kk)
      var r = 1
      while (r <= kk && selected.length < cand.length) {
        var bestId = -1L
        var bestScore = Long.MinValue
        cand.foreach { case (id, simq) =>
          if (!taken.contains(id)) {
            var maxSel = Long.MinValue
            val row = sim.get(id)
            selected.foreach { s =>
              val m = if (row != null && row.containsKey(s)) row.get(s) else 0L
              if (m > maxSel) maxSel = m
            }
            if (selected.isEmpty) maxSel = 0L
            val score = lam * simq - (1000000L - lam) * maxSel
            if (score > bestScore) { bestScore = score; bestId = id }
          }
        }
        if (bestId >= 0) {
          selected += bestId
          taken.add(bestId)
          out += ((q, bestId, r.toLong, bestScore))
        }
        r += 1
      }
      out.iterator
    }.toDF(queryIdCol, idCol, "mmr_rank", "mmr_score_upm")
  }

  /** Element-wise centroid of embeddings per group: posexplode to
    * (group, dim, value), average per cell. One shuffle keyed by
    * (group, dim) — scales with |groups| · dim, independent of corpus
    * size after the partial agg. */
  def centroids(corpus: DataFrame, groupCol: String,
                vecCol: String = "embedding", scale: Int = 4): DataFrame = {
    // floor-based rounding (not round()): Spark rounds the decimal STRING
    // repr of a double, oracle engines round binary — midpoint values
    // diverge (see graft.queries.Probes.binRound)
    val p = math.pow(10.0, scale)
    corpus
      .select(col(groupCol), posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
      .groupBy(col(groupCol), (col("pos") + 1).cast("long").as("dim"))
      .agg((floor(avg(col("v")) * p + 0.5) / p).as("centroid_val"))
      .orderBy(col(groupCol), col("dim"))
  }

  /** Mutual nearest neighbors from ANY (query_id, vec_id, rank) kNN
    * frame: the pairs where each side ranks the other within its top
    * `kMutual` — the margin/bitext-mining reciprocity filter (Artetxe &
    * Schwenk's mutual-NN criterion) that kills hub vectors a one-sided
    * top-k would pair with everything. Composes with every searcher in
    * this file: brute force for exact audits, [[lshTopK]]/[[ivfTopK]] as
    * the 100 TB candidate stage (the filter only ever REMOVES pairs, so
    * approximate inputs stay approximate — no false mutuality appears).
    *
    * One self-equi-join on the (query, neighbor) pair key — linear in
    * k·|queries|, never corpus². Output: `id_a` < `id_b` (each mutual
    * pair once), `rank_ab` (b's rank in a's list), `rank_ba`, total
    * order (id_a, id_b).
    */
  /** Embedding-distribution drift between two snapshots: per group, the
    * exact squared L2 distance between the snapshots' integer-micro
    * centroids — the embedding-space analogue of
    * [[graft.operators.Profile.driftChi2]] (categorical drift). A
    * retrained encoder, a crawler mix shift, or an ingestion bug moves
    * a group's centroid; dist2 = 0 means bit-identical means.
    *
    * Exactness: vectors quantize once (⌊x·10⁶+0.5⌋, the
    * [[graft.operators.Clustering]] discipline), per-(group, dim) means
    * are truncating DECIMAL DIV, and dist2 accumulates (Δ)² in
    * DECIMAL(38,0) — engine- and layout-exact end to end.
    *
    * Scale posture: each side is one (group, dim)-keyed aggregate
    * (shuffle = groups·dims partial rows, not vectors), joined on
    * (group, dim) and re-aggregated to groups — nothing row-scaled
    * past the first aggregate. Groups present on only one side carry
    * NULL dist2 (no fake zero) with their one-sided counts.
    *
    * Output: `group`, `n_a`, `n_b` LONG, `dims` LONG (dims compared),
    * `dist2_micro2` LONG (Σ Δ², micro² units; NULL if one-sided),
    * total order by group.
    */
  def centroidShiftMicro(a: DataFrame, b: DataFrame, groupCol: String,
                         vecCol: String = "embedding"): DataFrame = {
    def moments(df: DataFrame, cn: String, nn: String): DataFrame = df
      .select(col(groupCol).cast("string").as("group"),
        posexplode(transform(col(vecCol), x =>
          floor(x.cast("double") * lit(1000000.0d) + lit(0.5d))
            .cast("long"))).as(Seq("dim", "__x")))
      .groupBy(col("group"), col("dim"))
      .agg(expr("CAST(sum(CAST(__x AS DECIMAL(38,0))) DIV count(1) AS BIGINT)")
        .as(cn), count(lit(1)).as(nn))
    val ma = moments(a, "__ca", "__na")
    val mb = moments(b, "__cb", "__nb")
    ma.join(mb, Seq("group", "dim"), "full_outer")
      .groupBy(col("group"))
      .agg(
        coalesce(max(col("__na")), lit(0L)).as("n_a"),
        coalesce(max(col("__nb")), lit(0L)).as("n_b"),
        count(lit(1)).as("dims"),
        sum((col("__ca") - col("__cb")).cast("decimal(38,0)") *
          (col("__ca") - col("__cb"))).cast("long").as("dist2_micro2"))
      .orderBy("group")
  }

  /** Exact covariance moment table of an embedding column — the
    * anisotropy/whitening audit ("is the space collapsing onto a few
    * directions?") and the input a PCA/whitening step consumes.
    * Vectors are micro-quantized (q = ⌊x·10⁶ + 0.5⌋) so every moment is
    * an exact integer, order-free and engine-replayable — float
    * covariance would flap on summation order at exactly the scale
    * where this matters.
    *
    * Shape: ONE pass with [[graft.functions.Aggregators
    * .outerProduct]]'s dim²-long mergeable buffer (map-side partials;
    * the shuffle carries one 32 KB buffer per partition — never the
    * n·dim² exploded product stream the SQL replay materializes), plus
    * a dim-sized per-dimension sum aggregate broadcast back onto the
    * exploded dim² moment rows. `cov_q2 = (n·Σqᵢqⱼ − Σqᵢ·Σqⱼ) DIV n` in
    * DECIMAL(38,0)-widened arithmetic (truncating toward zero on both
    * engines) — n× the covariance, kept integer-exact.
    *
    * Null / wrong-length vectors are excluded (make the filter explicit
    * upstream if partial vectors are data bugs). Output: `i`, `j` LONG
    * (0-based dims), `n_vecs`, `sum_i`, `sum_j`, `sum_prod`, `cov_q2`
    * LONG; total order (i, j). */
  def covarianceMoments(df: DataFrame, vec: Column, dim: Int): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    val clean = df.select(vec.as("__v"))
      .filter(col("__v").isNotNull && size(col("__v")) === dim)
    val outer = clean.agg(
      graft.functions.Aggregators.outerProduct(dim)(col("__v")).as("__o"))
    val prods = outer
      .select(col("__o.n").as("n_vecs"),
        posexplode(col("__o.prods")).as(Seq("idx", "sum_prod")))
      .select(col("n_vecs"), expr(s"idx DIV $dim").as("i"),
        expr(s"CAST(idx % $dim AS BIGINT)").as("j"), col("sum_prod"))
    val sums = clean
      .select(posexplode(col("__v")).as(Seq("__i", "__x")))
      .withColumn("__q",
        expr("CAST(floor(CAST(__x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"))
      .groupBy(col("__i").cast("long").as("__i"))
      .agg(sum(col("__q")).as("__s"))
    prods
      .join(broadcast(sums.select(col("__i").as("i"), col("__s").as("sum_i"))),
        "i")
      .join(broadcast(sums.select(col("__i").as("j"), col("__s").as("sum_j"))),
        "j")
      .select(col("i"), col("j"), col("n_vecs"), col("sum_i"), col("sum_j"),
        col("sum_prod"),
        expr("""CAST((CAST(n_vecs AS DECIMAL(38,0)) * sum_prod
               |      - CAST(sum_i AS DECIMAL(38,0)) * sum_j)
               |     div n_vecs AS BIGINT)""".stripMargin).as("cov_q2"))
      .orderBy("i", "j")
  }

  /** Top principal direction of the embedding cloud by POWER ITERATION
    * over [[covarianceMoments]]' integer moment table — the one-vector
    * answer to the anisotropy question that table raises ("WHICH
    * direction is the space collapsing onto?"), and the direction a
    * whitening/de-biasing step (all-but-the-top removal à la
    * Arora et al.'s SIF) would subtract.
    *
    * Iteration stays ENTIRELY integer: u = C·v with exact
    * DECIMAL(38,0) products, then the max-abs rescale
    *
    *   v'_i = sign(u_i) · ((|u_i| · 10⁶) DIV max|u|)
    *
    * — magnitude-only truncating quotients, so Spark DIV and DuckDB //
    * agree even though components are SIGNED (the sign never enters a
    * division). Leader magnitude pins at 10⁶; a zero matrix yields the
    * zero vector, not a division error. `lambda_q2` = max|u| DIV 10⁶
    * is the Rayleigh-style growth factor in cov_q2 units — the top
    * eigenvalue estimate the fixed v0 = (1,…,1)·10⁶ start and `iters`
    * rounds determine EXACTLY (deterministic, both engines replay
    * bit-for-bit; the usual sign ambiguity of eigenvectors is resolved
    * by that fixed start). v0 = (10⁶ + j) per dimension — the +j
    * symmetry-breaker keeps the start from being exactly orthogonal to
    * the top direction (the all-ones start provably stalls on, e.g., a
    * pure (1, −1) principal axis).
    *
    * Scale posture: the corpus is touched ONCE, by covarianceMoments'
    * mergeable one-pass aggregator (32 KB partials); every iteration
    * after that is dim²-row joins against a dim-row vector — driver-
    * scale work distributed only for uniformity. localCheckpoint per
    * round keeps the max-consumer lineage flat (the HITS lesson).
    *
    * Output (dim rows): `i` LONG, `v_micro` LONG (signed, leader |·| =
    * 10⁶), `lambda_q2` LONG (repeated — window-total convention);
    * total order by i. */
  def topComponent(df: DataFrame, vec: Column, dim: Int,
                   iters: Int): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val m = covarianceMoments(df, vec, dim)
      .select(col("i"), col("j"), col("cov_q2"))
      .localCheckpoint(true) // dim² rows; corpus scan happens HERE, once
    var v = m.select(col("j")).distinct()
      .select(col("j"), (lit(1000000L) + col("j")).as("s"))
    var lastMx: DataFrame = null
    var it = 0
    while (it < iters) {
      val u = m.join(v, "j")
        .groupBy(col("i"))
        .agg(coalesce(sum(col("cov_q2").cast("decimal(38,0)") * col("s")),
          lit(0L).cast("decimal(38,0)")).as("__u"))
        .localCheckpoint(true)
      lastMx = u.agg(max(abs(col("__u"))).as("__mx"))
      v = u.crossJoin(broadcast(lastMx))
        .select(col("i").as("j"),
          when(col("__mx") > 0,
            (when(col("__u") < 0, -1L).otherwise(1L)) *
              expr("(abs(__u) * 1000000) DIV __mx")).otherwise(0L).as("s"))
      it += 1
    }
    v.select(col("j").as("i"), col("s").as("v_micro"))
      .crossJoin(broadcast(lastMx.select(
        coalesce(expr("__mx DIV 1000000"), lit(0L)).as("lambda_q2"))))
      .orderBy(col("i"))
  }

  def mutualPairs(knn: DataFrame, kMutual: Int = 1,
                  idCol: String = "vec_id",
                  queryIdCol: String = "query_id"): DataFrame = {
    require(kMutual >= 1, "kMutual >= 1")
    val e = knn.filter(col("rank") <= kMutual)
      .select(col(queryIdCol).as("__qa"), col(idCol).as("__va"),
        col("rank").as("rank_ab"))
    val rev = e.select(col("__va").as("__qa"), col("__qa").as("__va"),
      col("rank_ab").as("rank_ba"))
    e.join(rev, Seq("__qa", "__va"))
      .filter(col("__qa") < col("__va"))
      .select(col("__qa").as("id_a"), col("__va").as("id_b"),
        col("rank_ab"), col("rank_ba"))
      .orderBy("id_a", "id_b")
  }

  /** Diagonal-Mahalanobis embedding outliers — the multivariate "is
    * this vector even from this cloud?" intake screen (mislabeled
    * modality, truncated encodes, adversarial junk): per row the sum of
    * per-dimension squared z-scores against the corpus mean/variance,
    * top-k reported. The diagonal form is the honest 100 TB choice —
    * the full-Σ score needs an inverse, which is a driver-side float
    * factorization; per-dimension variances keep everything exact and
    * one-pass (and [[covarianceMoments]]/[[topComponent]] already
    * cover the correlated-direction question).
    *
    * Exactness: vectors micro-quantize (q = ⌊x·10⁶ + 0.5⌋); with
    * per-dim n, S_d = Σq and V_d = n·Σq² − S_d² (= n²·σ²_d),
    *
    *   z²_d (micro) = ((q_d·n − S_d)² · 10⁶) DIV V_d
    *
    * — numerator a square, V_d > 0, so the truncating quotient is
    * engine-safe; constant dimensions (V_d = 0) contribute 0 and are
    * counted once in `n_const_dims`. Ranking is [[graft.operators
    * .Relational.globalRank]] on (score desc, id asc) — a total order.
    * i64/decimal bound: (q·n − S)² ≤ (2·10⁶·n)², DECIMAL(38,0)-safe to
    * n ≈ 10⁹ vectors with |x| ≤ 1-ish; quantize coarser above that.
    *
    * Scale posture: TWO corpus passes, both narrow — a per-dim moments
    * aggregate collapsed to ONE row of dim-sized arrays (broadcast
    * cross join back), then the per-row score as an in-row
    * zip_with/aggregate expression (no row×dim explode ever shuffles);
    * the top-k pick is globalRank + filter (rank ≤ k prunes at the
    * exchange). Null / wrong-length vectors are excluded, matching
    * [[covarianceMoments]].
    *
    * Output: `id`, `score_micro`, `rank` LONG (+ `n`, `n_const_dims`
    * LONG, constant) — total order by rank, rank ≤ topK.
    */
  def mahalanobisDiag(df: DataFrame, id: Column, vec: Column, dim: Int,
                      topK: Int): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val clean = df.select(id.cast("long").as("id"), vec.as("__v"))
      .filter(col("id").isNotNull && col("__v").isNotNull &&
        size(col("__v")) === dim)
      .withColumn("__q", expr(
        "transform(__v, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000" +
          " + 0.5) AS BIGINT))"))
    val stats = clean
      .select(posexplode(col("__q")).as(Seq("__d", "__x")))
      .groupBy(col("__d"))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"),
        sum(col("__x").cast("decimal(38,0)") * col("__x")).as("__s2"))
      .withColumn("__vn",
        col("__n") * col("__s2") -
          col("__s").cast("decimal(38,0)") * col("__s"))
      .groupBy()
      .agg(max(col("__n")).as("n"),
        coalesce(sum(when(col("__vn") <= 0, 1L).otherwise(0L)), lit(0L))
          .as("n_const_dims"),
        expr("transform(array_sort(collect_list(struct(__d, __s)))," +
          " p -> p.__s)").as("__sums"),
        expr("transform(array_sort(collect_list(struct(__d, " +
          "CAST(__vn AS DECIMAL(38,0)) AS v))), p -> p.v)")
          .as("__vars"))
    clean.crossJoin(broadcast(stats))
      .withColumn("score_micro", expr(
        """CAST(aggregate(
          |  zip_with(
          |    zip_with(__q, __sums, (q, s) ->
          |      CAST(q AS DECIMAL(38,0)) * n - s),
          |    __vars, (e, v) ->
          |      CASE WHEN v > 0 THEN (e * e * 1000000) DIV v
          |        ELSE CAST(0 AS DECIMAL(38,0)) END),
          |  CAST(0 AS DECIMAL(38,0)), (acc, x) -> acc + x)
          |AS BIGINT)""".stripMargin))
      .transform(d => Relational.globalRank(d,
        Seq(col("score_micro").desc, col("id").asc)))
      .filter(col("rank") <= topK.toLong)
      .select(col("id"), col("score_micro"), col("rank"), col("n"),
        col("n_const_dims"))
      .orderBy(col("rank"))
  }
}
