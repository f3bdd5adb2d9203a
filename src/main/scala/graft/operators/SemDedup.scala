package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup shape: cluster the embedding space,
  * then drop near-duplicates WITHIN each cluster) — the third embedding
  * dedup family next to exact-cosine (q41) and SRP-LSH (q42). Clustering
  * bounds the candidate set by cluster size instead of hash-bucket
  * collisions: pair work is O(Σ|cluster|²), never O(n²), and each
  * cluster's pair generation is an equi-join on the cluster id.
  *
  * Everything is exact integer arithmetic so the whole pipeline —
  * including the k-means iterations — is bit-reproducible on any engine
  * and any partitioning (same discipline as `Graph.pagerankMicro`):
  *  - vectors quantized to micro-units: q_i = floor(x_i · 1e6) (longs);
  *  - distance = Σ (q_i − c_i)² (exact long — |q| ≤ ~1e6·dim);
  *  - assignment = argmin distance, ties to the LOWEST centroid id;
  *  - centroid update = floor(Σ q_i / count) per component;
  *  - init = the k lowest-id vectors (deterministic, no RNG);
  *  - near-dup gate = cos²(a,b) ≥ thr² via dot² ≥ thr²·|a|²·|b|² with
  *    dot > 0 — one fixed-shape IEEE comparison, no sqrt.
  *
  * Scale posture (100 TB): k centroids live on the driver (k·dim longs —
  * same bounded-collect contract as IVF training in
  * `operators.Similarity`); each Lloyd's iteration is one narrow
  * assignment pass plus one (cluster, pos)-keyed aggregation with
  * map-side combine. The within-cluster pair join is the SemDeDup
  * trade: pick k so clusters fit pairwise work (k ~ n/1000); skewed
  * mega-clusters show up in `clusterSizes` and call for a larger k or a
  * recursive split, exactly like `Fuzzy.blockStats`.
  */
object SemDedup {

  /** floor(x·1e6) micro-unit quantization, float → long, elementwise. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1000000.0)).cast("long"))

  /** HOF reference formulations (interpreted lambda path). The hot paths
    * use the native codegen expressions ([[graft.plans.LongDot]] /
    * [[graft.plans.ClusterAssign]]); these stay as the independent
    * implementations the spec cross-checks bitwise — integer arithmetic,
    * so "bitwise" means literal equality. */
  private[operators] def sqDistHof(qv: Column, centroid: Seq[Long]): Column =
    aggregate(
      zip_with(qv, typedLit(centroid), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, v) => acc + v)

  private[operators] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  private[operators] def assignColHof(qv: Column, centroids: Seq[(Int, Seq[Long])]): Column =
    array_min(array(centroids.map { case (cid, c) =>
      // aliases inside struct() are dropped when the child is a lambda
      // aggregate, so name the fields via a positional cast instead
      struct(sqDistHof(qv, c), lit(cid)).cast("struct<dist:bigint,cid:int>")
    }: _*)).getField("cid")

  private def dotCol(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column =
    graft.plans.HashExprs.longDot(spark, a, b)

  /** Cluster id (argmin of exact squared distance, ties → lowest id)
    * for each row's quantized vector against the given centroids —
    * native codegen expression, centroids shipped once per plan. */
  private def assignCol(spark: org.apache.spark.sql.SparkSession, qv: Column,
                        centroids: Seq[(Int, Seq[Long])]): Column = {
    val sorted = centroids.sortBy(_._1) // strict-< argmin ⇒ lowest cid on ties
    graft.plans.HashExprs.clusterAssign(spark, qv,
      sorted.flatMap(_._2).toArray, sorted.map(_._1).toArray,
      sorted.head._2.length)
  }

  /** Deterministic integer Lloyd's: k lowest-id seeds, `iters` rounds of
    * assign + floor-mean update. Returns (cid, centroid) pairs; clusters
    * that go empty drop out (their cid vanishes — both engines agree).
    * Each round collects k·dim longs to the driver — bounded by k, not
    * by data. */
  def fit(emb: DataFrame, vec: Column, id: Column, k: Int, iters: Int): Seq[(Int, Seq[Long])] = {
    require(k >= 1 && iters >= 0, s"need k >= 1, iters >= 0; got k=$k iters=$iters")
    val q = emb.select(id.as("vec_id"), quantize(vec).as("qv"))
    var centroids: Seq[(Int, Seq[Long])] = q.orderBy("vec_id").limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Long](1) }.toSeq
    for (_ <- 0 until iters if centroids.nonEmpty) {
      centroids = q
        .select(assignCol(emb.sparkSession, col("qv"), centroids).as("cid"),
          posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .withColumn("cx", floor(col("sx").cast("double") / col("n")).cast("long"))
        .groupBy("cid").agg(sort_array(collect_list(struct(col("pos"), col("cx")))).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).toSeq)
        .toSeq.sortBy(_._1)
    }
    centroids
  }

  /** (vec_id, cluster, qv) for every row under the fitted centroids.
    * An empty centroid set (only possible from an empty fit input)
    * degrades to a null cluster instead of failing to build the
    * assignment expression — EmptyCorpusSpec's contract. */
  def assign(emb: DataFrame, vec: Column, id: Column,
             centroids: Seq[(Int, Seq[Long])]): DataFrame = {
    val cl =
      if (centroids.isEmpty) lit(null).cast("int")
      else assignCol(emb.sparkSession, col("qv"), centroids)
    emb.select(id.as("vec_id"), quantize(vec).as("qv"))
      .withColumn("cluster", cl)
  }

  /** Full SemDeDup: fit, assign, then flag each vector `kept = false`
    * iff some LOWER-id vector in the same cluster has cosine ≥ `thr`
    * with it. Output: (vec_id, cluster, kept), one row per input. */
  def semDedup(emb: DataFrame, vec: Column, id: Column,
               k: Int = 8, iters: Int = 2, thr: Double = 0.35): DataFrame = {
    val assigned = assign(emb, vec, id, fit(emb, vec, id, k, iters))
      .withColumn("n2", dotCol(emb.sparkSession, col("qv"), col("qv")))
    val a = assigned.select(col("cluster"), col("vec_id").as("id_a"),
      col("qv").as("qa"), col("n2").as("na"))
    val b = assigned.select(col("cluster"), col("vec_id").as("id_b"),
      col("qv").as("qb"), col("n2").as("nb"))
    val thr2 = thr * thr
    // cos ≥ thr  ⇔  dot > 0 ∧ dot² ≥ thr²·|a|²·|b|² — fixed parenthesization,
    // mirrored verbatim in the oracle SQL so the IEEE rounding agrees
    val dupIds = a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b"))
      .withColumn("dot", dotCol(emb.sparkSession, col("qa"), col("qb")))
      .filter(col("dot") > 0 &&
        col("dot").cast("double") * col("dot").cast("double") >=
          lit(thr2) * (col("na").cast("double") * col("nb").cast("double")))
      .select(col("id_b").as("vec_id")).distinct()
    assigned.join(dupIds.withColumn("__dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        not(coalesce(col("__dup"), lit(false))).as("kept"))
  }

  /** Cluster-size report — the skew guard (cf. `Fuzzy.blockStats`). */
  def clusterSizes(emb: DataFrame, vec: Column, id: Column,
                   centroids: Seq[(Int, Seq[Long])]): DataFrame =
    assign(emb, vec, id, centroids).groupBy("cluster")
      .agg(count(lit(1)).as("n")).orderBy("cluster")
}
