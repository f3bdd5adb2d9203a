package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Model-based document filtering — the fastText/CCNet-style quality or
  * domain classifier of pre-training pipelines (label a seed set, train a
  * linear text model, score the whole corpus, gate on the score), built
  * on the engine's log-free integer discipline so train and inference are
  * bit-deterministic on any engine and any partitioning.
  *
  * Arithmetic contract: multinomial Naive Bayes scores in Σ log p, and
  * `log` is libm-dependent (not bit-portable across engines), so the
  * model here is the exact integer analogue of the NB evidence — the
  * per-term LIKELIHOOD RATIO with add-one smoothing, in parts-per-million
  * and truncated:
  *
  *   w_ppm(t) = (1e6 · (c⁺(t)+1) · (T⁻+V)) DIV ((T⁺+V) · (c⁻(t)+1))
  *
  * (c± = term-occurrence counts in the positive/negative class, T± =
  * class token totals, V = vocabulary size — the add-one denominators).
  * A term seen only in the positive class gets w ≫ 1e6, only in the
  * negative class w ≪ 1e6, balanced terms ≈ 1e6. Inference aggregates
  * the ratios LINEARLY (the `LangModel.fluency` discipline — same
  * ranking spirit as the log-sum, none of its float non-determinism):
  *
  *   score_ppm(doc) = (Σ_t tf(t) · w_ppm(t)) DIV n_tokens
  *
  * i.e. the average per-token ratio; `score_ppm ≥ 1e6` predicts
  * positive. All quantities are nonnegative integers (DECIMAL(38,0)
  * intermediates), so truncating DIV matches DuckDB's flooring `//`.
  *
  * Scale posture (100 TB): training is two vocabulary-keyed aggregates
  * (map-side combined token counts per (term, class) — the shuffle is
  * one row per distinct (term, class), not one per token) and the model
  * is O(vocabulary), bounded by Zipf, not corpus size. Inference
  * re-streams the corpus' (doc, term) tf frame and joins the model on
  * `term` — AQE broadcasts the model when it fits. Unseen terms back
  * off to the zero-count ratio w₀ through the left join, so scoring a
  * corpus disjoint from the training set stays well-defined.
  */
object Classify {

  /** Train integer likelihood-ratio weights from labeled documents.
    * `label` must be a boolean column (null labels are dropped).
    *
    * Output: one row per term — (`term`, `c_pos`, `c_neg`, `w_ppm`) —
    * plus the class totals (`t_pos`, `t_neg`, `v`) carried as constant
    * columns so inference can derive the unseen-term ratio without a
    * second pass over the training corpus. `minCount` prunes the Zipf
    * tail (terms with c_pos + c_neg < minCount). */
  def ratioModel(docs: DataFrame, label: Column, textCol: Column,
                 minCount: Long = 1L): DataFrame = {
    val counts = docs
      .filter(label.isNotNull)
      .select(label.as("__pos"), explode(Text.words(textCol)).as("term"))
      .groupBy(col("term"))
      .agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("c_neg"))
    val totals = counts.agg(
      sum(col("c_pos")).as("t_pos"),
      sum(col("c_neg")).as("t_neg"),
      count(lit(1)).as("v"))
    counts
      .filter(col("c_pos") + col("c_neg") >= minCount)
      .crossJoin(broadcast(totals))
      .withColumn("w_ppm",
        expr("""(CAST(1000000 AS DECIMAL(38,0)) * (c_pos + 1) * (t_neg + v))
                DIV (CAST(t_pos + v AS DECIMAL(38,0)) * (c_neg + 1))"""))
      .select(col("term"), col("c_pos"), col("c_neg"), col("w_ppm"),
        col("t_pos"), col("t_neg"), col("v"))
  }

  /** Score documents under a [[ratioModel]]: average per-token
    * likelihood ratio in ppm, positive when ≥ 1e6. Every input document
    * appears in the output; a document with no tokens scores NULL (no
    * evidence either way — gating it is the caller's policy).
    *
    * Output: (`id`, `n_tokens`, `score_ppm`, `pred`). */
  def ratioScore(docs: DataFrame, model: DataFrame,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    // unseen-term ratio: the model formula at c_pos = c_neg = 0
    val w0 = broadcast(model
      .agg(max(col("t_pos")).as("t_pos"), max(col("t_neg")).as("t_neg"),
        max(col("v")).as("v"))
      .select(expr("""(CAST(1000000 AS DECIMAL(38,0)) * (t_neg + v))
                      DIV CAST(t_pos + v AS DECIMAL(38,0))""").as("__w0")))
    val tf = docs
      .select(col(idCol), explode(Text.words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf
      .join(model.select(col("term"), col("w_ppm")), Seq("term"), "left_outer")
      .crossJoin(w0)
      .groupBy(col(idCol))
      .agg(
        sum(expr("CAST(tf AS DECIMAL(38,0)) * coalesce(w_ppm, __w0)"))
          .as("__num"),
        sum(col("tf")).as("n_tokens"))
      .withColumn("score_ppm",
        expr("CAST(__num DIV n_tokens AS BIGINT)"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("score_ppm"),
        when(col("score_ppm").isNotNull, col("score_ppm") >= lit(1000000L))
          .as("pred"))
  }

  /** Binary-classifier evaluation in one pass: confusion counts and the
    * ppm metrics every model-based filter is tuned on. Rows where either
    * side is NULL (unscorable docs, unlabeled rows) are counted in
    * `n_null` and excluded from the confusion cells. Metrics are exact
    * integer ppm with truncating DIV — NULL (not a crash, not a fake 0)
    * when undefined: precision with no positive predictions, recall
    * with no positive truth, f1 when either is NULL or both are 0.
    *
    * One aggregate over the scored frame — metrics derive from the
    * 5 counts on a single row; nothing else shuffles. Output:
    * (`tp`, `fp`, `tn`, `fn`, `n_null`, `accuracy_ppm`,
    * `precision_ppm`, `recall_ppm`, `f1_ppm`). */
  def evalBinary(scored: DataFrame, pred: Column, truth: Column): DataFrame =
    scored
      .agg(
        coalesce(sum(when(pred && truth, 1L).otherwise(0L)), lit(0L)).as("tp"),
        coalesce(sum(when(pred && !truth, 1L).otherwise(0L)), lit(0L)).as("fp"),
        coalesce(sum(when(!pred && !truth, 1L).otherwise(0L)), lit(0L)).as("tn"),
        coalesce(sum(when(!pred && truth, 1L).otherwise(0L)), lit(0L)).as("fn"),
        coalesce(sum(when(pred.isNull || truth.isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_null"))
      .withColumn("accuracy_ppm",
        when(col("tp") + col("tn") + col("fp") + col("fn") > 0L,
          expr("(1000000L * (tp + tn)) DIV (tp + tn + fp + fn)")))
      .withColumn("precision_ppm",
        when(col("tp") + col("fp") > 0L,
          expr("(1000000L * tp) DIV (tp + fp)")))
      .withColumn("recall_ppm",
        when(col("tp") + col("fn") > 0L,
          expr("(1000000L * tp) DIV (tp + fn)")))
      .withColumn("f1_ppm",
        when(col("precision_ppm").isNotNull && col("recall_ppm").isNotNull &&
          col("precision_ppm") + col("recall_ppm") > 0L,
          expr("(2L * precision_ppm * recall_ppm) DIV (precision_ppm + recall_ppm)")))

  /** Leave-one-out target encoding: replace a categorical feature with
    * the mean target of the OTHER rows in its category — the standard
    * high-cardinality encoder, leave-one-out so a row never leaks its
    * own label into its feature (the train-time variant; at inference
    * the plain category mean applies).
    *
    * Exact integers: loo = (Σ_cat − own) DIV (n_cat − 1), truncating —
    * engine- and layout-exact; singleton categories yield NULL (no
    * other rows — the caller decides the fallback, usually the global
    * mean; never a fake 0).
    *
    * One category-keyed aggregate + an equi-join back (AQE broadcasts
    * category tables of sane size) — no windows. Output: all input
    * columns projected via `id`, plus `n_cat` LONG and `loo_cents`
    * LONG-or-NULL, total order by id.
    */
  def targetEncodeLoo(df: DataFrame, id: Column, category: Column,
                      targetCents: Column): DataFrame = {
    val base = df.select(id.as("id"), category.cast("string").as("category"),
        targetCents.cast("long").as("__y"))
      .filter(col("__y").isNotNull && col("category").isNotNull)
    val stats = base.groupBy(col("category"))
      .agg(count(lit(1)).as("n_cat"),
        sum(col("__y").cast("decimal(38,0)")).as("__sum"))
    base.join(stats, "category")
      .withColumn("loo_cents",
        when(col("n_cat") > 1L,
          expr("CAST((__sum - __y) DIV (n_cat - 1L) AS BIGINT)")))
      .select(col("id"), col("category"), col("n_cat"), col("loo_cents"))
      .orderBy("id")
  }

  /** Per-subgroup binary evaluation — [[evalBinary]] sliced by a
    * protected or operational attribute (language, source, region):
    * the fairness/regression audit that catches "the classifier is
    * fine on average and terrible on Swahili". Same exact ppm metric
    * discipline, same NULL-when-undefined contract, ONE aggregate
    * grouped by the slice; rows with a null slice value form their own
    * "(null)" group (they're exactly the rows a fairness audit must
    * not drop silently).
    *
    * Output: one row per group — `group`, `tp`, `fp`, `tn`, `fn`,
    * `n_null` LONG, `accuracy_ppm`/`precision_ppm`/`recall_ppm`/
    * `f1_ppm` LONG-or-NULL, total order by group.
    */
  def evalBinaryBy(scored: DataFrame, by: Column, pred: Column,
                   truth: Column): DataFrame =
    scored
      .withColumn("__grp", coalesce(by.cast("string"), lit("(null)")))
      .groupBy(col("__grp").as("group"))
      .agg(
        coalesce(sum(when(pred && truth, 1L).otherwise(0L)), lit(0L)).as("tp"),
        coalesce(sum(when(pred && !truth, 1L).otherwise(0L)), lit(0L)).as("fp"),
        coalesce(sum(when(!pred && !truth, 1L).otherwise(0L)), lit(0L)).as("tn"),
        coalesce(sum(when(!pred && truth, 1L).otherwise(0L)), lit(0L)).as("fn"),
        coalesce(sum(when(pred.isNull || truth.isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_null"))
      .withColumn("accuracy_ppm",
        when(col("tp") + col("tn") + col("fp") + col("fn") > 0L,
          expr("(1000000L * (tp + tn)) DIV (tp + tn + fp + fn)")))
      .withColumn("precision_ppm",
        when(col("tp") + col("fp") > 0L,
          expr("(1000000L * tp) DIV (tp + fp)")))
      .withColumn("recall_ppm",
        when(col("tp") + col("fn") > 0L,
          expr("(1000000L * tp) DIV (tp + fn)")))
      .withColumn("f1_ppm",
        when(col("precision_ppm").isNotNull && col("recall_ppm").isNotNull &&
          col("precision_ppm") + col("recall_ppm") > 0L,
          expr("(2L * precision_ppm * recall_ppm) DIV (precision_ppm + recall_ppm)")))
      .orderBy("group")

  /** Multiclass evaluation: per-class one-vs-rest cells and exact ppm
    * precision/recall/F1 — [[evalBinary]] generalized past two labels
    * (quality tiers, language ID, topic routing all grade multiclass).
    *
    * One (truth, pred) confusion aggregate (classes²-sized, map-side
    * combined); per-class marginals come from windows over that frame,
    * never a second data pass. NULL (not fake 0) where a metric is
    * undefined; rows with a null on either side are excluded from the
    * confusion mass (quarantine upstream — [[evalBinary]]'s n_null
    * pattern — if you need the count).
    *
    * Output: one row per class observed in truth or pred — `class`,
    * `tp`, `fp`, `fn`, `support` LONG, `precision_ppm`, `recall_ppm`,
    * `f1_ppm` LONG-or-NULL, total order by class.
    */
  def evalMulticlass(scored: DataFrame, pred: Column,
                     truth: Column): DataFrame = {
    val cells = scored
      .select(pred.cast("string").as("__p"), truth.cast("string").as("__t"))
      .filter(col("__p").isNotNull && col("__t").isNotNull)
      .groupBy(col("__p"), col("__t")).agg(count(lit(1)).as("__n"))
    val predTotals = cells.groupBy(col("__p").as("class"))
      .agg(sum(col("__n")).as("__np"))
    val truthTotals = cells.groupBy(col("__t").as("class"))
      .agg(sum(col("__n")).as("__nt"))
    val diag = cells.filter(col("__p") === col("__t"))
      .select(col("__p").as("class"), col("__n").as("tp"))
    predTotals
      .join(truthTotals, Seq("class"), "full_outer")
      .join(diag, Seq("class"), "left_outer")
      .select(col("class"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("__np"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fp"),
        (coalesce(col("__nt"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fn"),
        coalesce(col("__nt"), lit(0L)).as("support"))
      .withColumn("precision_ppm",
        when(col("tp") + col("fp") > 0L,
          expr("(1000000L * tp) DIV (tp + fp)")))
      .withColumn("recall_ppm",
        when(col("tp") + col("fn") > 0L,
          expr("(1000000L * tp) DIV (tp + fn)")))
      .withColumn("f1_ppm",
        when(col("precision_ppm").isNotNull && col("recall_ppm").isNotNull &&
          col("precision_ppm") + col("recall_ppm") > 0L,
          expr("(2L * precision_ppm * recall_ppm) DIV (precision_ppm + recall_ppm)")))
      .orderBy("class")
  }

  /** Exact ROC-AUC over an integer score — the threshold-free companion
    * to [[evalBinary]]'s fixed-threshold cells. Computed as the
    * Mann-Whitney rank statistic with the standard tie treatment
    * (each tied pos/neg pair contributes ½), kept in integers by
    * accumulating DOUBLED pair credit:
    *
    *   u2 = Σ_s [ 2·nPos(s)·nNeg(<s) + nPos(s)·nNeg(s) ]
    *   auc = u2 / (2·nPos·nNeg)   — ONE IEEE division of exact integers
    *
    * Scale posture: rows collapse to a score-keyed aggregate first
    * (map-side combined — the frame shrinks to |distinct scores| ≤
    * |score space|, ppm scores bound it at 1e6+1); the cumulative
    * negatives-below then come from the [[Relational.globalRank]]
    * discipline — range exchange on score, per-partition prefix sums,
    * and an O(#partitions) offsets cumsum — never a single-partition
    * window over data. Null score/truth rows are quarantined in
    * `n_null`, never silently scored.
    *
    * Output (one row): `n_pos`, `n_neg`, `n_null` LONG, `u2` LONG (the
    * exact doubled rank mass — the audit surface), `auc` DOUBLE (NULL
    * when either class is empty — never 0/0).
    *
    * `u2` ACCUMULATES in DECIMAL(38,0) — the per-score np·below products
    * pass 2^63 once each class exceeds ~2e9 rows — but is PUBLISHED as
    * BIGINT: a cross-engine DECIMAL output column is hash-unsafe in the
    * correctness gate (engines serialize numerically-equal decimals
    * differently), and 2·nPos·nNeg < 2^63 holds for every gated scale.
    * If the >2^63 regime is ever needed, report u2 as a (hi, lo) LONG
    * pair instead of re-widening the published column.
    */
  def aucExact(scored: DataFrame, score: Column, truth: Column): DataFrame = {
    val base = scored.select(score.cast("long").as("__s"),
      truth.cast("boolean").as("__t"))
    val nNull = base
      .agg(coalesce(sum(when(col("__s").isNull || col("__t").isNull, 1L)
        .otherwise(0L)), lit(0L)).as("n_null"))
    val perScore = base
      .filter(col("__s").isNotNull && col("__t").isNotNull)
      .groupBy(col("__s"))
      .agg(
        coalesce(sum(when(col("__t"), 1L).otherwise(0L)), lit(0L)).as("__np"),
        coalesce(sum(when(!col("__t"), 1L).otherwise(0L)), lit(0L)).as("__nn"))
    // cumulative negatives strictly below each score: range exchange +
    // per-partition prefix + broadcast partition offsets (globalRank's
    // shape — the only global window is over #partitions rows)
    val parted = perScore.repartitionByRange(col("__s"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = parted.groupBy(col("__pid"))
      .agg(coalesce(sum(col("__nn")), lit(0L)).as("__pn"))
      .withColumn("__off",
        coalesce(sum(col("__pn")).over(
          BoundedWindow.ordered(col("__pid"), col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val wp = Window.partitionBy(col("__pid")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val credited = parted.join(broadcast(offsets), "__pid")
      .withColumn("__below", col("__off") + coalesce(sum(col("__nn")).over(wp), lit(0L)))
      .agg(
        coalesce(sum(col("__np")), lit(0L)).as("n_pos"),
        coalesce(sum(col("__nn")), lit(0L)).as("n_neg"),
        // u2 accumulates in DECIMAL(38,0): the per-score terms are
        // np·below products that pass 2^63 once n_pos·n_neg exceeds
        // ~2e9 rows per class — LONG would overflow exactly at the
        // corpus scale this operator documents. Exact integer audit
        // surface, just carried wide.
        coalesce(sum(lit(2L).cast("decimal(38,0)") * col("__np") *
            col("__below") +
          col("__np").cast("decimal(38,0)") * col("__nn")),
          lit(0L).cast("decimal(38,0)")).as("u2"))
    credited.crossJoin(broadcast(nNull))
      .withColumn("auc",
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          col("u2").cast("double") /
            (lit(2L).cast("decimal(38,0)") * col("n_pos") *
              col("n_neg")).cast("double")))
      .select(col("n_pos"), col("n_neg"), col("n_null"),
        col("u2").cast("long").as("u2"), col("auc"))
  }

  /** Reliability-diagram bins over a ppm score in [0, 1e6] — the
    * calibration companion to [[aucExact]] (AUC says the ranking is
    * right; calibration says the probabilities mean what they claim).
    * Equal-width bins: bin = min(nBins−1, score·nBins DIV 1e6+1 scale) —
    * all integer, engine-exact; per bin the truncating mean predicted
    * ppm and the empirical positive rate in ppm.
    *
    * One score-row pass into an nBins-sized aggregate (map-side
    * combined); nothing else shuffles. Rows with null score/truth are
    * dropped (quarantine belongs to [[aucExact]]'s n_null or an
    * upstream gate). Output: `bin` INT, `n` LONG, `mean_pred_ppm`
    * LONG (truncating), `pos_rate_ppm` LONG (truncating), total order
    * by bin.
    */
  def calibrationBins(scored: DataFrame, scorePpm: Column, truth: Column,
                      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    scored
      .select(scorePpm.cast("long").as("__cal_s"),
        truth.cast("boolean").as("__cal_t"))
      .filter(col("__cal_s").isNotNull && col("__cal_t").isNotNull)
      .withColumn("bin",
        least(lit(nBins - 1),
          expr(s"(__cal_s * ${nBins}L) DIV 1000000L")).cast("int"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        expr("CAST(sum(CAST(__cal_s AS DECIMAL(38,0))) DIV count(1) AS BIGINT)")
          .as("mean_pred_ppm"),
        expr("(1000000L * sum(CASE WHEN __cal_t THEN 1L ELSE 0L END)) DIV count(1)")
          .as("pos_rate_ppm"))
      .orderBy("bin")
  }

  /** Decile lift / cumulative-gains table — the campaign-targeting and
    * threshold-picking readout AUC can't give: rank the population by
    * score, cut it into `bins` equal-count tiles, and report how many
    * positives each cumulative prefix captures vs. random targeting.
    *
    * `scorePpm` is an INTEGER score (ppm-scaled like
    * [[calibrationBins]]'s, or any integer ranking key): it is cast to
    * LONG, so a raw double model score in [0,1] would TRUNCATE to 0 and
    * the ranking would silently degenerate to the tieBreak order —
    * pre-scale doubles with `(score * 1e6).cast("long")` first.
    *
    * Ranking uses [[graft.operators.Relational.globalRank]] (range
    * exchange + per-partition offsets) — NEVER `row_number() OVER
    * (ORDER BY …)`'s single-partition sort. `tieBreak` must complete a
    * total order with the score (equal scores would otherwise make the
    * tile boundary layout-dependent). Tiles come from
    * `((rank−1)·bins) DIV n` — the first (n mod bins) tiles carry one
    * extra row, deterministically on every engine.
    *
    * All metrics are truncating integer ppm over DECIMAL(38,0)-widened
    * products — exact, order-free, engine-replayable:
    * `cum_lift_ppm = (cum_pos·n·10⁶) DIV (cum_n·total_pos)` (1 000 000
    * = random, bins·10⁶ = best possible for the first tile),
    * `capture_ppm = cum_pos·10⁶ DIV total_pos` (the gains curve),
    * `pos_rate_ppm` per tile.
    *
    * Shape: one range exchange for the rank, one (tile)-keyed aggregate
    * with map-side combine, then windows over the BINS-sized frame (the
    * bounded exception) + a one-row totals broadcast. Output: `decile`
    * 1..bins, `n_rows`, `n_pos`, `cum_n`, `cum_pos`, `pos_rate_ppm`,
    * `capture_ppm`, `cum_lift_ppm` LONG; total order by decile. NULL
    * scores/labels are excluded (scored population only); degenerate
    * total_pos = 0 yields NULL capture/lift, never a fake zero. */
  def decileLift(scored: DataFrame, scorePpm: Column, tieBreak: Column,
                 truth: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val base = scored
      .select(scorePpm.cast("long").as("__s"), tieBreak.as("__tb"),
        truth.cast("boolean").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
    val ranked = Relational.globalRank(base,
      Seq(col("__s").desc, col("__tb").asc))
    val totals = ranked.agg(count(lit(1)).as("__n"),
      sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"))
    val tiles = ranked.crossJoin(broadcast(totals))
      .withColumn("decile",
        (expr(s"((rank - 1) * ${bins}L) DIV __n") + 1L))
      .groupBy(col("decile"), col("__n"), col("__pos"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"))
    val cum = BoundedWindow.ordered(col("decile"), col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tiles
      .withColumn("cum_n", sum(col("n_rows")).over(cum))
      .withColumn("cum_pos", sum(col("n_pos")).over(cum))
      .select(col("decile"), col("n_rows"), col("n_pos"), col("cum_n"),
        col("cum_pos"),
        expr("(1000000L * n_pos) DIV n_rows").as("pos_rate_ppm"),
        expr("CASE WHEN __pos > 0 THEN (1000000L * cum_pos) DIV __pos END")
          .as("capture_ppm"),
        expr("""CASE WHEN __pos > 0
               | THEN (CAST(cum_pos AS DECIMAL(38,0)) * __n * 1000000)
               |      div (CAST(cum_n AS DECIMAL(38,0)) * __pos) END"""
          .stripMargin).as("cum_lift_ppm"))
      .orderBy("decile")
  }

  /** Brier score with the Murphy (1973) decomposition over the
    * [[calibrationBins]] reliability diagram — the one-row answer to
    * "is the probability BAD or just UNSHARP": Brier ≈ REL − RES + UNC
    * where reliability charges miscalibrated bins, resolution credits
    * bins that separate the classes, and uncertainty is the
    * irreducible ȳ(1−ȳ).
    *
    * Integer contract: scores are ppm, labels 0/10⁶, every published
    * number a truncated integer MEAN in micro² units (Σ DIV n) from
    * order-free long/DECIMAL(38,0) sums — hash-proof on any engine.
    * The decomposition is computed over the ppm-TRUNCATED bin means
    * (exactly the q154 diagram a dashboard plots). Murphy's identity
    * Brier = REL − RES + UNC is EXACT only when forecasts are constant
    * within each bin; over binned forecasts the residual equals the
    * within-bin variance minus twice the within-bin forecast–outcome
    * covariance (plus ppm quantization). `decomp_gap_micro2` PUBLISHES
    * that residual instead of hiding it — a large gap means the bins
    * are too coarse for this score distribution, itself a diagnostic
    * (Stephenson et al. '08 call these the within-bin terms).
    *
    * Shape: one bins-keyed aggregate (map-side combined) + windows
    * over the bins-sized frame; NULL score/label rows are excluded.
    * Binning clamps to [0, nBins−1] at BOTH ends (the ppm contract:
    * scores outside [0, 10⁶] land in the edge bins rather than
    * minting negative bin ids whose integer division diverges
    * cross-engine); their (p−y)² terms still enter the Brier sum
    * un-clamped, so a caller feeding out-of-contract scores sees it
    * in a large `decomp_gap_micro2`, not silence.
    * Output (one row): `n` LONG, `brier_micro2`, `rel_micro2`,
    * `res_micro2`, `unc_micro2`, `decomp_gap_micro2` LONG (all
    * truncated means in µ²; NULL-free — degenerate n = 0 yields no
    * row upstream of the caller's guard). */
  def brierDecomposition(scored: DataFrame, scorePpm: Column,
                         truth: Column, nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val base = scored.select(scorePpm.cast("long").as("__s"),
        truth.cast("boolean").as("__t"))
      .filter(col("__s").isNotNull && col("__t").isNotNull)
      .withColumn("__y", when(col("__t"), 1000000L).otherwise(0L))
      // clamp BOTH ends: ppm scores outside [0, 1e6] land in the edge
      // bins instead of minting negative bins — and the clamp is what
      // keeps out-of-range inputs engine-agnostic (Spark DIV truncates
      // toward zero, DuckDB // floors; they disagree only below zero,
      // where both now collapse to bin 0)
      .withColumn("__bin",
        greatest(lit(0L),
          least(lit(nBins - 1L), expr(s"(__s * ${nBins}L) DIV 1000000L"))))
    val bins = base.groupBy(col("__bin"))
      .agg(count(lit(1)).as("__nb"),
        // Σ(p−y)²: each term ≤ 10¹² — accumulate wide, stay exact
        expr("""CAST(sum(CAST(__s - __y AS DECIMAL(38,0)) * (__s - __y))
               | AS DECIMAL(38,0))""".stripMargin).as("__sq"),
        expr("sum(__s) DIV count(1)").as("__mp"), // mean pred ppm (trunc)
        expr("sum(__y) DIV count(1)").as("__pr")) // pos rate ppm (trunc)
    val wAll = BoundedWindow.total(col("__nb"))
    bins
      .withColumn("__n", sum(col("__nb")).over(wAll))
      .withColumn("__ybar",
        expr("""CAST(sum(CAST(__pr AS DECIMAL(38,0)) * __nb) OVER
               | (PARTITION BY pmod(hash(__nb), 1)
               |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
               |  FOLLOWING) AS DECIMAL(38,0))""".stripMargin))
      .withColumn("__ybar_ppm", expr("CAST(__ybar DIV __n AS BIGINT)"))
      .groupBy(col("__n"), col("__ybar_ppm"))
      .agg(
        expr("CAST(sum(__sq) DIV first(__n) AS BIGINT)")
          .as("brier_micro2"),
        expr("""CAST(sum(CAST(__mp - __pr AS DECIMAL(38,0)) *
               | (__mp - __pr) * __nb) DIV first(__n) AS BIGINT)"""
          .stripMargin).as("rel_micro2"),
        expr("""CAST(sum(CAST(__pr - __ybar_ppm AS DECIMAL(38,0)) *
               | (__pr - __ybar_ppm) * __nb) DIV first(__n) AS BIGINT)"""
          .stripMargin).as("res_micro2"))
      .withColumn("unc_micro2",
        expr("__ybar_ppm * (1000000L - __ybar_ppm)"))
      .withColumn("decomp_gap_micro2",
        col("brier_micro2") -
          (col("rel_micro2") - col("res_micro2") + col("unc_micro2")))
      .select(col("__n").as("n"), col("brier_micro2"), col("rel_micro2"),
        col("res_micro2"), col("unc_micro2"), col("decomp_gap_micro2"))
  }

  /** Doubly-robust off-policy estimate (Dudík–Langford–Li ICML'11) —
    * [[ipsEval]]'s variance-reduced sibling: a reward MODEL (the
    * "direct method") predicts the target action's value everywhere,
    * and the IPS term only corrects the model's residual on matched
    * logs:
    *
    *   DR = (1/n) Σ [ q̂(x, π(x)) + w·(r − q̂(x, a)) ],
    *   w  = 1[π(x)=a] / p(a|x)
    *
    * Unbiased if EITHER the model or the propensities are right —
    * hence doubly robust; when the model is decent the correction
    * terms are small and the estimator's variance collapses vs plain
    * IPS. The model here is the caller-supplied per-action value table
    * `qhat` (action → value_micro) — the empirical per-action mean is
    * the standard non-parametric choice and keeps everything exactly
    * replayable (no fitted floats).
    *
    * Integer discipline: identical to [[ipsEval]] — exact long
    * weights, DECIMAL(38,0)-accumulated correction terms (residuals
    * can be negative: the wide sum is signed), model terms summed as
    * longs, DR one IEEE division. `n_bad_propensity` counts matched
    * zero/NULL-propensity rows; their CORRECTION is dropped (the model
    * term still contributes — the DR-specific graceful degradation,
    * vs IPS which loses the row entirely).
    *
    * Output (one row): `n`, `n_matched`, `n_bad_propensity` LONG,
    * `sum_model` LONG (Σ q̂(x, π(x)) µ), `sum_corr` LONG
    * (Σ w·(r − q̂) DIV 10⁶, signed), `dm_value_micro`,
    * `dr_value_micro` DOUBLE (the direct-method and DR estimates;
    * NULL when n = 0). */
  def drEval(logs: DataFrame, contextKey: Column, loggedAction: Column,
             rewardMicro: Column, propensityPpm: Column,
             policy: DataFrame, policyKey: Column, policyAction: Column,
             qhat: DataFrame, qhatAction: Column,
             qhatValueMicro: Column): DataFrame = {
    val l = logs.select(contextKey.as("__k"), loggedAction.as("__a"),
      rewardMicro.cast("long").as("__r"),
      propensityPpm.cast("long").as("__p"))
    val pol = policy.select(policyKey.as("__pk"), policyAction.as("__pa"))
    val q = qhat.select(qhatAction.as("__qa"),
      qhatValueMicro.cast("long").as("__qv"))
    val joined = l.join(pol, col("__k") === col("__pk"), "inner")
      // model value of the TARGET action (every row)
      .join(broadcast(q.select(col("__qa").as("__pa"),
        col("__qv").as("__q_pi"))), Seq("__pa"), "left_outer")
      // model value of the LOGGED action (for the residual)
      .join(broadcast(q.select(col("__qa").as("__a"),
        col("__qv").as("__q_a"))), Seq("__a"), "left_outer")
      .withColumn("__q_pi0", coalesce(col("__q_pi"), lit(0L)))
      .withColumn("__q_a0", coalesce(col("__q_a"), lit(0L)))
      .withColumn("__match", col("__a") <=> col("__pa"))
      .withColumn("__bad",
        col("__match") && (col("__p").isNull || col("__p") <= 0L))
      .withColumn("__w",
        when(col("__match") && !col("__bad"),
          expr("1000000000000L DIV __p")).otherwise(lit(0L)))
    joined.agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col("__match"), 1L).otherwise(0L)), lit(0L))
          .as("n_matched"),
        coalesce(sum(when(col("__bad"), 1L).otherwise(0L)), lit(0L))
          .as("n_bad_propensity"),
        coalesce(sum(col("__q_pi0")), lit(0L)).as("sum_model"),
        expr("""CAST(coalesce(sum(CAST(__w AS DECIMAL(38,0)) *
               | (__r - __q_a0)), 0) DIV 1000000 AS BIGINT)"""
          .stripMargin).as("sum_corr"))
      .withColumn("dm_value_micro",
        when(col("n") > 0L, col("sum_model").cast("double") / col("n")))
      .withColumn("dr_value_micro",
        when(col("n") > 0L,
          (col("sum_model") + col("sum_corr")).cast("double") / col("n")))
      .select(col("n"), col("n_matched"), col("n_bad_propensity"),
        col("sum_model"), col("sum_corr"), col("dm_value_micro"),
        col("dr_value_micro"))
  }

  /** Split-conformal prediction thresholds PER GROUP (Vovk et al.;
    * Angelopoulos–Bates '21 tutorial form): given each group's
    * calibration nonconformity scores, the threshold is the
    * ⌈(n+1)(1−α)⌉-th smallest score — predictions whose score is ≤ the
    * threshold then carry a distribution-free ≥ 1−α coverage
    * guarantee. The per-slice form (per language / per source) is the
    * one production filters need: a single global threshold
    * under-covers the hard slices.
    *
    * Integer discipline: scores are integer (ppm-scaled like the rest
    * of the eval tier), α arrives in ppm, and the needed rank is the
    * exact ceil-division `((n+1)·(10⁶−α_ppm) + 10⁶ − 1) DIV 10⁶` — no
    * float ever decides a rank. When the rank exceeds n (too few
    * calibration points for the asked coverage), `threshold` is NULL —
    * the honest "cannot guarantee", never the max score. Tied scores
    * are safe: the k-th smallest VALUE is order-independent even when
    * row identity under ties is not.
    *
    * Shape: the winsorize/equidepth order-statistic discipline — ROWS
    * never sort: one (group, value) count aggregate (map-side
    * combined; the frame is bounded by |distinct scores| per group,
    * ppm scores cap it at 10⁶+1), a cumulative over that counts frame,
    * and the threshold is the smallest value whose cumulative count
    * reaches the needed rank. The NULL group is a REAL slice (the
    * [[woeIv]] convention): rows with a NULL group key calibrate their
    * own threshold — the counts⋈cum join is null-safe (`<=>`), so the
    * NULL slice gets a real threshold whenever its rank is attainable
    * instead of a spurious "cannot guarantee". Output: `group`, `n`
    * LONG, `rank_needed` LONG, `threshold` LONG (NULL when
    * unattainable); total order by group NULLS FIRST. */
  def conformalThreshold(df: DataFrame, group: Column, score: Column,
                         alphaPpm: Long): DataFrame = {
    require(alphaPpm > 0L && alphaPpm < 1000000L,
      s"alphaPpm in (0, 1e6), got $alphaPpm")
    val base = df.select(group.cast("string").as("group"),
        score.cast("long").as("__s"))
      .filter(col("__s").isNotNull)
    val counts = base.groupBy(col("group")).agg(count(lit(1)).as("n"))
      .withColumn("rank_needed",
        expr(s"((n + 1L) * ${1000000L - alphaPpm} + 999999L) DIV 1000000L"))
    val perVal = base.groupBy(col("group"), col("__s"))
      .agg(count(lit(1)).as("__c"))
    val wv = Window.partitionBy(col("group")).orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perVal.withColumn("__cum", sum(col("__c")).over(wv))
      .withColumnRenamed("group", "__g")
    // null-safe join: the NULL group is a real calibration slice and
    // must meet its own cumulative counts, not fall out of the join
    counts.join(cum, col("group") <=> col("__g"), "left_outer")
      .groupBy(col("group"), col("n"), col("rank_needed"))
      // smallest value whose cumulative count reaches the rank = the
      // k-th smallest score; no value reaches an unattainable rank
      // (rank_needed > n) so min() is NULL there by construction
      .agg(min(when(col("__cum") >= col("rank_needed"), col("__s")))
        .as("threshold"))
      .select(col("group"), col("n"), col("rank_needed"), col("threshold"))
      .orderBy("group")
  }

  /** Off-policy evaluation of a target policy on LOGGED bandit
    * feedback — inverse propensity scoring (Horvitz–Thompson '52;
    * Li et al. WSDM'11 for the bandit form) plus the self-normalized
    * variant (SNIPS, Swaminathan–Joachims NeurIPS'15): given logs of
    * (context, logged action, reward, logging propensity) and a
    * deterministic target policy's action per context,
    *
    *   IPS   = (1/n) Σ  r·1[π(x)=a] / p(a|x)
    *   SNIPS = Σ w·r / Σ w,   w = 1[π(x)=a] / p(a|x)
    *
    * — the estimator that answers "how would the NEW ranking/filter
    * policy have scored on last month's traffic" without deploying it.
    *
    * Integer discipline: propensities arrive in ppm, rewards in
    * integer micro-units; each weight is the exact integer
    * `10¹² DIV p_ppm` (so w ≈ 10⁶/p as micro-units), each term the
    * exact long product `w·r_µ` accumulated in DECIMAL(38,0)
    * (order-free), and the published estimates are single IEEE
    * divisions of exact integers. Matches with p_ppm ≤ 0 or NULL are
    * COUNTED (`n_bad_propensity`) and excluded — a zero logged
    * propensity means the logger could never take that action, and
    * dividing by it would be infinite weight, not data.
    *
    * Shape: one equi-join on the context key (policy side is usually
    * derived from the same frame — pre-aliased internally against the
    * self-join trap), one single-row aggregate. Output (one row): `n`
    * (scored logs), `n_matched`, `n_bad_propensity` LONG,
    * `sum_w_upm`, `sum_wr` LONG (audit surface: Σw in µ-units,
    * Σ w·r_µ DIV 10⁶), `ips_value_micro`, `snips_value_micro` DOUBLE
    * (NULL when degenerate: no rows / no matched weight). */
  def ipsEval(logs: DataFrame, contextKey: Column, loggedAction: Column,
              rewardMicro: Column, propensityPpm: Column,
              policy: DataFrame, policyKey: Column,
              policyAction: Column): DataFrame = {
    val l = logs.select(contextKey.as("__k"), loggedAction.as("__a"),
      rewardMicro.cast("long").as("__r"),
      propensityPpm.cast("long").as("__p"))
    val pol = policy.select(policyKey.as("__pk"),
      policyAction.as("__pa"))
    val joined = l.join(pol, col("__k") === col("__pk"), "inner")
      .withColumn("__match", col("__a") <=> col("__pa"))
      .withColumn("__bad",
        col("__match") && (col("__p").isNull || col("__p") <= 0L))
      // exact integer weight in µ-units: 10¹² DIV p_ppm ≈ 10⁶/p
      .withColumn("__w",
        when(col("__match") && !col("__bad"),
          expr("1000000000000L DIV __p")).otherwise(lit(0L)))
    joined.agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col("__match"), 1L).otherwise(0L)), lit(0L))
          .as("n_matched"),
        coalesce(sum(when(col("__bad"), 1L).otherwise(0L)), lit(0L))
          .as("n_bad_propensity"),
        coalesce(sum(col("__w")), lit(0L)).as("sum_w_upm"),
        // Σ w·r_µ: the product can pass 2⁶³ (w up to 10¹²) — accumulate
        // wide, publish DIV 10⁶ (back to µ·µ/10⁶ = µ scale), < 2⁶³ for
        // any gated volume
        expr("""CAST(coalesce(sum(CAST(__w AS DECIMAL(38,0)) * __r), 0)
               | DIV 1000000 AS BIGINT)""".stripMargin).as("sum_wr"))
      .withColumn("ips_value_micro",
        when(col("n") > 0L,
          col("sum_wr").cast("double") / col("n")))
      // sum_wr·10⁶ would overflow LONG; sum_wr is < 2⁵³ at any gated
      // volume, so cast-then-multiply is the SAME correctly-rounded
      // double as the exact wide product cast once (oracle-aligned)
      .withColumn("snips_value_micro",
        when(col("sum_w_upm") > 0L,
          col("sum_wr").cast("double") * 1000000.0 /
            col("sum_w_upm")))
      .select(col("n"), col("n_matched"), col("n_bad_propensity"),
        col("sum_w_upm"), col("sum_wr"), col("ips_value_micro"),
        col("snips_value_micro"))
  }

  /** Weight-of-evidence / information-value table over a CATEGORICAL
    * feature — the credit-scoring-lineage readout of how much a single
    * feature separates a binary label, and the standard pre-model
    * feature screen (IV < 0.02 useless, > 0.5 suspicious):
    *
    *   woe(bin)  = ln( (pos_bin·NEG) / (neg_bin·POS) )
    *   iv        = Σ_bins (pos_bin/POS − neg_bin/NEG) · woe(bin)
    *
    * Determinism: counts are exact longs; each double op is a fixed
    * sequence (two long→double products, one division, one ln, …) so
    * any IEEE engine replays bit-for-bit — the [[aucExact]] discipline
    * applied to a log scale. One-sided bins (pos or neg = 0) have
    * UNDEFINED woe: they surface with NULL `woe`/`iv_contrib` and are
    * EXCLUDED from `iv` (never smoothed silently — smoothing is a
    * caller-visible modeling choice, not a default; the NULL rows are
    * the loud signal). NULL labels are excluded; NULL bins form their
    * own bin (missingness is often the most predictive bin — hiding it
    * would understate IV).
    *
    * Shape: one (bin)-keyed count aggregate (map-side combined), a
    * one-row totals broadcast, windows only over the bins-sized frame.
    * Output: `bin` STRING (NULL for the missing bin), `n`, `n_pos`,
    * `n_neg` LONG, `woe` DOUBLE, `iv_contrib` DOUBLE, `iv_upm` LONG
    * (the feature total in micro units: Σ floor(contrib·10⁶ + 0.5),
    * repeated per row — the screen reads one number; quantized-then-
    * summed LONGS because a float Σ over bins is summation-order-
    * dependent and engines order window frames differently, while each
    * per-row double IS a fixed IEEE sequence); total order by bin
    * (nulls first). */
  def woeIv(df: DataFrame, bin: Column, truth: Column): DataFrame = {
    val base = df.select(bin.cast("string").as("bin"),
        truth.cast("boolean").as("__t"))
      .filter(col("__t").isNotNull)
    val bins = base.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("__t"), 1L).otherwise(0L)), lit(0L))
          .as("n_pos"),
        coalesce(sum(when(!col("__t"), 1L).otherwise(0L)), lit(0L))
          .as("n_neg"))
    val totals = bins.agg(
      coalesce(sum(col("n_pos")), lit(0L)).as("__POS"),
      coalesce(sum(col("n_neg")), lit(0L)).as("__NEG"))
    val scored = bins.crossJoin(broadcast(totals))
      .withColumn("woe",
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          log((col("n_pos").cast("double") * col("__NEG")) /
            (col("n_neg").cast("double") * col("__POS")))))
      .withColumn("iv_contrib",
        when(col("woe").isNotNull,
          (col("n_pos").cast("double") / col("__POS") -
            col("n_neg").cast("double") / col("__NEG")) * col("woe")))
    scored
      .withColumn("iv_upm",
        coalesce(sum(floor(col("iv_contrib") * 1000000L + 0.5)
          .cast("long")).over(
          BoundedWindow.total(col("bin"))), lit(0L)))
      .select(col("bin"), col("n"), col("n_pos"), col("n_neg"),
        col("woe"), col("iv_contrib"), col("iv_upm"))
      .orderBy(col("bin").asc_nulls_first)
  }

  /** Isotonic (PAV) probability calibration over the binned
    * reliability diagram — the classic Zadrozny–Elkan '02 move:
    * [[calibrationBins]] DIAGNOSES miscalibration, this one FIXES it,
    * producing the monotone score→probability map a downstream filter
    * applies. Pool-adjacent-violators is computed in its closed
    * minimax form (Robertson–Wright–Dykstra '88, Thm 1.4.4):
    *
    *   fit_i = max_{j ≤ i} min_{k ≥ i} avg(y over bins j..k)
    *
    * over the weighted bin frame, which is embarrassingly parallel —
    * no sequential stack, no driver loop — and O(B³) pairs on a frame
    * of B ≤ 100 bins: trivially bounded work, however many rows fed
    * the bins.
    *
    * Determinism: interval means are exact TRUNCATING integer ppm —
    * (10⁶·Σ n_pos) DIV Σ n over exact long prefix sums; max-of-min
    * over a fixed integer table is engine- and layout-exact, and the
    * monotonicity proof (fit_{i+1} ≥ fit_i: the feasible j-set grows,
    * the k-set shrinks) holds for ANY fixed interval table, truncation
    * included. Mean preservation holds up to ppm truncation per pooled
    * block (the spec pins exact equality on integral-mean tables).
    *
    * Shape: one bins-keyed aggregate over the rows (map-side
    * combined), collected — B ≤ 100 rows, the documented bounded
    * exception (the BPE-argmax / centroid-table precedent) — then the
    * O(B³) minimax folds on the driver and the result re-enters as a
    * local relation. The relational tail this replaces (prefix window
    * + two theta joins + join-back on the bins frame) re-ran the
    * corpus scan per consumer and paid ~1 s of fixed job overhead for
    * ≤ 100 rows of work; at any corpus scale the distributed part is
    * exactly the one scan + aggregate. Output: `bin` INT, `n`, `n_pos`
    * LONG, `rate_ppm` LONG (raw binned rate), `fit_ppm` LONG (the
    * isotonic fit; always nondecreasing in bin); total order by bin. */
  def isotonicCalibrate(scored: DataFrame, scorePpm: Column,
                        truth: Column, nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 100,
      s"nBins in [2, 100] (the B^3 frame is the bound), got $nBins")
    val base = scored.select(scorePpm.cast("long").as("__s"),
        truth.cast("boolean").as("__t"))
      .filter(col("__s").isNotNull && col("__t").isNotNull)
      .withColumn("__bin",
        greatest(lit(0L),
          least(lit(nBins - 1L), expr(s"(__s * ${nBins}L) DIV 1000000L"))))
    // ONE distributed pass: the bins-keyed aggregate (map-side
    // combined). Everything after it is ≤ nBins rows — collect and
    // fold on the driver instead of paying 5+ tiny-stage jobs (the
    // relational tail measured ~1.3 s of pure fixed overhead at sf0.1
    // and re-ran the corpus scan per consumer).
    val binRows = base.groupBy(col("__bin"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("__t"), 1L).otherwise(0L)), lit(0L))
          .as("n_pos"))
      .collect() // bounded: ≤ nBins ≤ 100 rows by the require above
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)

    // prefix sums over OBSERVED bins (empty bins carry no weight and
    // cannot affect any interval mean); exact long arithmetic — the
    // truncating-DIV interval means are bit-identical to the SQL form
    // this replaces (all quantities non-negative, so trunc == floor ==
    // DuckDB's `//`)
    val b = binRows.length
    val cw = new Array[Long](b + 1)
    val cy = new Array[Long](b + 1)
    var i = 0
    while (i < b) {
      cw(i + 1) = cw(i) + binRows(i)._2
      cy(i + 1) = cy(i) + binRows(i)._3
      i += 1
    }
    // closed minimax: fit_i = max_{j ≤ i} min_{k ≥ i} mean(j..k), with
    // mean(j..k) = (10⁶ · (cy_k − cy_{j−1})) DIV (cw_k − cw_{j−1})
    val fit = new Array[Long](b)
    i = 0
    while (i < b) {
      var best = Long.MinValue
      var j = 0
      while (j <= i) {
        var mn = Long.MaxValue
        var k = i
        while (k < b) {
          val a = (1000000L * (cy(k + 1) - cy(j))) / (cw(k + 1) - cw(j))
          if (a < mn) mn = a
          k += 1
        }
        if (mn > best) best = mn
        j += 1
      }
      fit(i) = best
      i += 1
    }

    val out = binRows.zipWithIndex.map { case ((bin, n, nPos), ix) =>
      (bin.toInt, n, nPos, 1000000L * nPos / n, fit(ix))
    }
    // LocalRelation — no job, no partitions; B ≤ 100 rows
    scored.sparkSession.createDataFrame(out.toSeq)
      .toDF("bin", "n", "n_pos", "rate_ppm", "fit_ppm")
      .orderBy("bin")
  }

  /** Mutual information between two categorical columns — the
    * model-free "how much does knowing X tell you about Y" feature
    * screen, in nats:
    *
    *   MI = Σ_{x,y} (n_xy/N) · ln(N·n_xy / (n_x·n_y))
    *
    * [[woeIv]] is the binary-target member of this family and
    * [[graft.operators.Profile.contingency]] the significance-test
    * member; MI adds the multi-class-both-sides measure (source vs
    * language, event type vs segment) plus the per-cell contributions
    * that say WHICH pairings carry the association. Negative
    * contributions are real (cells rarer than independence predicts);
    * the total is ≥ 0 up to quantization.
    *
    * Determinism (the woeIv/BM25 ln precedent): every cell is one
    * pinned IEEE sequence — p = n_xy/N (one division), the ln argument
    * as (N·n_xy)/(n_x·n_y) with DOUBLE products on both engines (exact
    * long seeds; products first so no intermediate overflows a long),
    * one ln, one multiply — then floor-quantized to NANO-nats (MI of
    * near-independent pairs lives at the 4th decimal; micro would
    * alias it to 0) and the total is the order-free SUM OF QUANTIZED
    * LONGS over the cells frame. NULL on either axis drops the row
    * (the caller maps NULL to a sentinel category if it matters).
    *
    * Shape: the contingency discipline — ONE (x, y) aggregate with
    * map-side combine; marginals and the total from windows over that
    * cells-sized frame (bounded by |X|·|Y| observed combos, the
    * documented bounded-frame exception); the input is never
    * re-scanned. Output: `x_val`, `y_val` STRING, `n` LONG, `n_x`,
    * `n_y` LONG, `mi_contrib_nano` LONG, `mi_nano` LONG (total,
    * repeated per cell); total order (x_val, y_val). */
  def mutualInfo(df: DataFrame, xc: Column, yc: Column): DataFrame = {
    val cells = df
      .select(xc.cast("string").as("x_val"), yc.cast("string").as("y_val"))
      .filter(col("x_val").isNotNull && col("y_val").isNotNull)
      .groupBy(col("x_val"), col("y_val"))
      .agg(count(lit(1)).as("n"))
    val wx = Window.partitionBy(col("x_val"))
    val wy = Window.partitionBy(col("y_val"))
    val wg = BoundedWindow.all(col("x_val"))
    cells
      .withColumn("n_x", sum(col("n")).over(wx))
      .withColumn("n_y", sum(col("n")).over(wy))
      .withColumn("__N", sum(col("n")).over(wg))
      .withColumn("mi_contrib_nano",
        floor((col("n").cast("double") / col("__N")) *
          log((col("__N").cast("double") * col("n")) /
            (col("n_x").cast("double") * col("n_y"))) * 1000000000L
          + 0.5).cast("long"))
      .withColumn("mi_nano",
        coalesce(sum(col("mi_contrib_nano")).over(wg), lit(0L)))
      .select(col("x_val"), col("y_val"), col("n"), col("n_x"),
        col("n_y"), col("mi_contrib_nano"), col("mi_nano"))
      .orderBy("x_val", "y_val")
  }

  /** McNemar's paired test — "is classifier A actually better than B on
    * the SAME items?": the eval-tier question accuracy deltas can't
    * answer (two models can differ by 2% accuracy yet disagree on 40%
    * of items, or agree on all but a handful). Only the DISCORDANT
    * pairs carry signal:
    *
    *   chi2_micro = ((b − c)² · 10⁶) DIV (b + c)
    *
    * with b = A-right-B-wrong, c = A-wrong-B-right — the numerator is a
    * square so the truncating quotient is sign-safe cross-engine; NULL
    * when b + c = 0 (the models never disagree — no evidence either
    * way, never a fake 0). The full concordance grid is published as
    * the audit surface.
    *
    * Scale posture: the corpus collapses in ONE map-side-combined
    * aggregate to four counters; nothing else moves. Rows with a NULL
    * truth or prediction are quarantined in `n_null`.
    *
    * Output (one row): `n`, `n_null`, `n_both_right`, `n_both_wrong`,
    * `n_a_only`, `n_b_only` LONG, `chi2_micro` LONG-or-NULL.
    */
  def mcnemar(df: DataFrame, truth: Column, predA: Column,
              predB: Column): DataFrame = {
    val base = df.select(truth.cast("string").as("__t"),
      predA.cast("string").as("__pa"), predB.cast("string").as("__pb"))
    base.agg(
        coalesce(sum(when(col("__t").isNotNull && col("__pa").isNotNull &&
          col("__pb").isNotNull, 1L).otherwise(0L)), lit(0L)).as("n"),
        coalesce(sum(when(col("__t").isNull || col("__pa").isNull ||
          col("__pb").isNull, 1L).otherwise(0L)), lit(0L)).as("n_null"),
        coalesce(sum(when(col("__pa") === col("__t") &&
          col("__pb") === col("__t"), 1L).otherwise(0L)), lit(0L))
          .as("n_both_right"),
        coalesce(sum(when(col("__t").isNotNull && col("__pa").isNotNull &&
          col("__pb").isNotNull && col("__pa") =!= col("__t") &&
          col("__pb") =!= col("__t"), 1L).otherwise(0L)), lit(0L))
          .as("n_both_wrong"),
        coalesce(sum(when(col("__pa") === col("__t") &&
          col("__pb") =!= col("__t"), 1L).otherwise(0L)), lit(0L))
          .as("n_a_only"),
        coalesce(sum(when(col("__t").isNotNull && col("__pa").isNotNull &&
          col("__pa") =!= col("__t") && col("__pb") === col("__t"), 1L)
          .otherwise(0L)), lit(0L)).as("n_b_only"))
      .withColumn("chi2_micro",
        when(col("n_a_only") + col("n_b_only") > 0L, expr(
          """((n_a_only - n_b_only) * (n_a_only - n_b_only) * 1000000L)
            | DIV (n_a_only + n_b_only)""".stripMargin)))
      .select(col("n"), col("n_null"), col("n_both_right"),
        col("n_both_wrong"), col("n_a_only"), col("n_b_only"),
        col("chi2_micro"))
  }

  /** Exact average precision (area under the PR curve, interpolation-
    * free) — the ranking-eval companion to [[aucExact]]: AUC is
    * prevalence-blind, AP is what retrieval/rare-positive screens
    * actually optimize. Ties are broken by `tieBreak` into a TOTAL
    * order (score desc, tieBreak asc), so the metric is deterministic
    * under any layout — the caller names the tie policy instead of
    * inheriting a layout accident.
    *
    *   AP = (1/P) · Σ_{positive at rank k} precision@k,
    *   precision@k published per row as (posRank·10⁶) DIV k
    *
    * — each term a truncating ppm quotient of exact integers (both
    * positive — engine-safe), the sum order-free LONG, and the final
    * mean one more truncating DIV. Quantization error is < P·10⁻⁶ in
    * the sum, deterministic and identical in any engine.
    *
    * Scale posture: TWO [[Relational.globalRank]] passes (all rows,
    * then positives only — a positive's rank among positives IS its
    * cumulative-positives count), each a range exchange + O(#partitions)
    * offsets window; rows never sort globally. NULL score/truth rows
    * quarantine in `n_null`.
    *
    * Output (one row): `n_pos`, `n_neg`, `n_null`, `sum_prec_ppm` LONG,
    * `ap_ppm` LONG-or-NULL (NULL when there are no positives).
    */
  def averagePrecision(scored: DataFrame, score: Column, truth: Column,
                       tieBreak: Column): DataFrame = {
    val base = scored.select(score.cast("long").as("__s"),
      truth.cast("boolean").as("__t"), tieBreak.cast("long").as("__tb"))
    val nNull = base.agg(coalesce(sum(when(col("__s").isNull ||
      col("__t").isNull, 1L).otherwise(0L)), lit(0L)).as("n_null"))
    val ranked = Relational.globalRank(
      base.filter(col("__s").isNotNull && col("__t").isNotNull),
      Seq(col("__s").desc, col("__tb").asc))
    val counts = ranked.agg(
      coalesce(sum(when(col("__t"), 1L).otherwise(0L)), lit(0L)).as("n_pos"),
      coalesce(sum(when(!col("__t"), 1L).otherwise(0L)), lit(0L)).as("n_neg"))
    val pos = Relational.globalRank(
      ranked.filter(col("__t")).withColumnRenamed("rank", "__k"),
      Seq(col("__k").asc))
    val sums = pos
      .agg(coalesce(sum(expr("(rank * 1000000L) DIV __k")), lit(0L))
        .as("sum_prec_ppm"))
    counts.crossJoin(sums).crossJoin(nNull)
      .withColumn("ap_ppm",
        when(col("n_pos") > 0L, expr("sum_prec_ppm DIV n_pos")))
      .select(col("n_pos"), col("n_neg"), col("n_null"),
        col("sum_prec_ppm"), col("ap_ppm"))
  }

  /** Cross-entropy / log loss of ppm-scale probability predictions —
    * the proper scoring rule that punishes CONFIDENT wrong answers the
    * way accuracy and AUC can't; the standard distillation/teacher-
    * quality readout.
    *
    * Per row the claimed probability of the TRUE outcome is
    * p = scorePpm (truth) or 10⁶ − scorePpm (not truth), clamped to
    * [1, 10⁶−1] ppm (`n_clamped` makes the epsilon visible — a model
    * emitting exact 0/1 claims is a bug worth seeing). The surprisal is
    * one pinned IEEE sequence, floor-nano-quantized per row
    * (`mutualInfo`'s posture):
    *
    *   nano = floor(−ln(p/10⁶) · 10⁹ + 0.5)
    *
    * summed as order-free LONGs; the mean is one truncating DIV (both
    * operands positive — engine-safe).
    *
    * Scale posture: one projection + one map-side-combined aggregate;
    * nothing shuffles but partial sums. NULL score/truth rows
    * quarantine in `n_null`. Out-of-range ppm (< 0 or > 10⁶) also
    * clamps — and counts — rather than silently extrapolating.
    *
    * Output (one row): `n`, `n_null`, `n_clamped`, `sum_nano` LONG,
    * `mean_nano` LONG-or-NULL.
    */
  def logLoss(scored: DataFrame, scorePpm: Column, truth: Column): DataFrame = {
    val base = scored.select(scorePpm.cast("long").as("__p"),
      truth.cast("boolean").as("__t"))
    val rows = base
      .filter(col("__p").isNotNull && col("__t").isNotNull)
      .withColumn("__pt",
        when(col("__t"), col("__p")).otherwise(lit(1000000L) - col("__p")))
      .withColumn("__pc", greatest(lit(1L), least(lit(999999L), col("__pt"))))
      .withColumn("__nano",
        floor(-log(col("__pc").cast("double") / 1000000.0) * 1000000000L
          + 0.5).cast("long"))
    val nNull = base.agg(coalesce(sum(when(col("__p").isNull ||
      col("__t").isNull, 1L).otherwise(0L)), lit(0L)).as("n_null"))
    rows.agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col("__pc") =!= col("__pt"), 1L).otherwise(0L)),
          lit(0L)).as("n_clamped"),
        coalesce(sum(col("__nano")), lit(0L)).as("sum_nano"))
      .crossJoin(nNull)
      .withColumn("mean_nano", when(col("n") > 0L, expr("sum_nano DIV n")))
      .select(col("n"), col("n_null"), col("n_clamped"), col("sum_nano"),
        col("mean_nano"))
  }

  /** Pinball (quantile) loss — the proper scoring rule for quantile
    * forecasts: a p90 prediction is judged by under-covering 10% of the
    * time with the right asymmetry, which MAE/MSE can't express. For
    * quantile q (ppm) and signed error d = actual − predicted:
    *
    *   loss = max(q·d, (q − 10⁶)·d) DIV 10⁶
    *
    * — the max of the two signed products is ≥ 0 by construction, so
    * the truncating quotient is engine-safe even though d is signed
    * (the [[Agreement]] trunc/floor lesson applied structurally). Sums
    * are exact (DECIMAL(38,0)-widened products), means truncating.
    *
    * Scale posture: one projection fans out ×|quantiles| narrow rows,
    * then ONE map-side-combined aggregate to a |quantiles|-sized
    * frame. NULL actual/predicted rows quarantine in `n_null`.
    *
    * Output (one row per quantile): `q_ppm`, `n`, `n_null`,
    * `sum_micro`, `mean_micro` LONG — total order by q_ppm.
    */
  def pinballLoss(df: DataFrame, actual: Column, predicted: Column,
                  quantilesPpm: Seq[Long]): DataFrame = {
    require(quantilesPpm.nonEmpty &&
      quantilesPpm.forall(q => q > 0L && q < 1000000L),
      s"quantiles must be in (0, 1e6), got $quantilesPpm")
    val base = df.select(actual.cast("long").as("__y"),
      predicted.cast("long").as("__p"))
    val nNull = base.agg(coalesce(sum(when(col("__y").isNull ||
      col("__p").isNull, 1L).otherwise(0L)), lit(0L)).as("n_null"))
    base
      .filter(col("__y").isNotNull && col("__p").isNotNull)
      .select(col("__y"), col("__p"),
        explode(array(quantilesPpm.map(lit): _*)).as("q_ppm"))
      .withColumn("__d", (col("__y") - col("__p")).cast("decimal(38,0)"))
      .withColumn("__loss", expr(
        "greatest(q_ppm * __d, (q_ppm - 1000000) * __d) DIV 1000000"))
      .groupBy(col("q_ppm"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("__loss")), lit(0L)).as("sum_micro"))
      .crossJoin(broadcast(nNull))
      .withColumn("mean_micro", when(col("n") > 0L,
        expr("sum_micro DIV n")))
      .select(col("q_ppm"), col("n"), col("n_null"), col("sum_micro"),
        col("mean_micro"))
      .orderBy(col("q_ppm"))
  }

  /** Youden-J optimal threshold — turn a scored validation set into
    * THE operating point: the threshold maximizing J = TPR − FPR (the
    * balanced cutoff AUC itself never picks). Decision rule: predict
    * positive when score ≥ threshold, candidates = the distinct scores.
    *
    * Per candidate, TP/FP come from the cumulative class counts below
    * each score ([[aucExact]]'s credited-rank staging on the same
    * per-score frame); J is the difference of two positive truncating
    * ppm quotients (deterministic — quantize-then-subtract, identical
    * in any engine). The argmax is ONE `min(struct(−J, s))` aggregate:
    * ties resolve to the SMALLEST threshold — a named total order, not
    * a layout accident.
    *
    * Scale posture: one score-keyed map-side-combined aggregate, one
    * range exchange for the cumulatives (globalRank discipline), one
    * struct-min rollup. NULL score/truth rows quarantine in `n_null`.
    *
    * Output (one row): `n_pos`, `n_neg`, `n_null` LONG, `threshold`
    * LONG-or-NULL (NULL when either class is empty — no trade-off
    * exists), `tp`, `fp`, `fn`, `tn`, `j_micro` LONG-or-NULL.
    */
  def bestThreshold(scored: DataFrame, score: Column,
                    truth: Column): DataFrame = {
    val base = scored.select(score.cast("long").as("__s"),
      truth.cast("boolean").as("__t"))
    val nNull = base.agg(coalesce(sum(when(col("__s").isNull ||
      col("__t").isNull, 1L).otherwise(0L)), lit(0L)).as("n_null"))
    val perScore = base
      .filter(col("__s").isNotNull && col("__t").isNotNull)
      .groupBy(col("__s"))
      .agg(
        coalesce(sum(when(col("__t"), 1L).otherwise(0L)), lit(0L)).as("__np"),
        coalesce(sum(when(!col("__t"), 1L).otherwise(0L)), lit(0L)).as("__nn"))
    val parted = perScore.repartitionByRange(col("__s"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = parted.groupBy(col("__pid"))
      .agg(coalesce(sum(col("__np")), lit(0L)).as("__pp"),
        coalesce(sum(col("__nn")), lit(0L)).as("__pn"))
      .withColumn("__offp",
        coalesce(sum(col("__pp")).over(BoundedWindow.ordered(col("__pid"), col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__offn",
        coalesce(sum(col("__pn")).over(BoundedWindow.ordered(col("__pid"), col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offp"), col("__offn"))
    val totals = perScore.agg(
      coalesce(sum(col("__np")), lit(0L)).as("n_pos"),
      coalesce(sum(col("__nn")), lit(0L)).as("n_neg"))
    val wb = Window.partitionBy(col("__pid")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val scoredThresh = parted.join(broadcast(offsets), "__pid")
      .crossJoin(broadcast(totals))
      .withColumn("__posBelow",
        col("__offp") + coalesce(sum(col("__np")).over(wb), lit(0L)))
      .withColumn("__negBelow",
        col("__offn") + coalesce(sum(col("__nn")).over(wb), lit(0L)))
      .withColumn("__tp", col("n_pos") - col("__posBelow"))
      .withColumn("__fp", col("n_neg") - col("__negBelow"))
      .withColumn("__j",
        expr("(__tp * 1000000L) DIV n_pos - (__fp * 1000000L) DIV n_neg"))
    val best = scoredThresh
      .filter(col("n_pos") > 0L && col("n_neg") > 0L)
      .agg(min(struct((-col("__j")).as("nj"), col("__s").as("s"),
        col("__tp").as("tp"), col("__fp").as("fp"))).as("__b"))
      .select(col("__b.s").as("threshold"), col("__b.tp").as("tp"),
        col("__b.fp").as("fp"), (-col("__b.nj")).as("j_micro"))
    totals.crossJoin(broadcast(nNull)).crossJoin(broadcast(best))
      .select(col("n_pos"), col("n_neg"), col("n_null"), col("threshold"),
        col("tp"), col("fp"),
        (col("n_pos") - col("tp")).as("fn"),
        (col("n_neg") - col("fp")).as("tn"), col("j_micro"))
  }

  /** Benjamini–Hochberg FDR control over a battery of test p-values —
    * the multiple-comparisons gate a monitoring pipeline needs the
    * moment it runs drift/AB tests per slice: at α = 0.05 across 1 000
    * slices, ~50 pure-noise alarms fire; BH picks the largest rank k
    * with p_(k) ≤ k·α/m and accepts exactly the k smallest, bounding
    * the EXPECTED false-discovery share at α.
    *
    * Entirely integer: ranks come from [[Relational.globalRank]] under
    * the total order (p_micro asc, test asc) — the tie policy is named,
    * not a layout accident — and the acceptance predicate is the
    * cleared-denominator form p·m ≤ rank·α (DECIMAL(38,0)-widened
    * products, no quotient at all on the decision path); the published
    * per-row `threshold_micro` = (rank·α) DIV m is positive-truncating,
    * engine-safe. Rows with NULL or out-of-[0, 10⁶] p are EXCLUDED
    * (unrankable) and counted in `n_dropped`.
    *
    * The step-up subtlety is honored: `selected` is rank ≤ k_max (the
    * LARGEST qualifying rank), so a non-qualifying p sandwiched below a
    * qualifying one is still accepted — gated in the spec, wrong in
    * most naive implementations.
    *
    * Scale posture: one globalRank range exchange + a one-row max
    * broadcast; the battery frame is |tests|-sized throughout.
    *
    * Output: `test`, `p_micro`, `rank`, `n_tests`, `n_dropped` LONG,
    * `threshold_micro` LONG, `selected` BOOLEAN — total order by rank.
    */
  def benjaminiHochberg(df: DataFrame, test: Column, pMicro: Column,
                        alphaMicro: Long): DataFrame = {
    require(alphaMicro > 0L && alphaMicro < 1000000L,
      s"alphaMicro must be in (0, 1e6), got $alphaMicro")
    val base = df.select(test.cast("string").as("test"),
      pMicro.cast("long").as("p_micro"))
    val dropped = base.agg(coalesce(sum(when(col("test").isNull ||
      col("p_micro").isNull || col("p_micro") < 0L ||
      col("p_micro") > 1000000L, 1L).otherwise(0L)), lit(0L))
      .as("n_dropped"))
    val ranked = Relational.globalRank(
      base.filter(col("test").isNotNull && col("p_micro").isNotNull &&
        col("p_micro") >= 0L && col("p_micro") <= 1000000L),
      Seq(col("p_micro").asc, col("test").asc))
    val m = ranked.agg(count(lit(1)).as("n_tests"))
    val staged = ranked.crossJoin(broadcast(m))
      .withColumn("__qual",
        col("p_micro").cast("decimal(38,0)") * col("n_tests") <=
          col("rank").cast("decimal(38,0)") * alphaMicro)
    val kMax = staged
      .agg(max(when(col("__qual"), col("rank"))).as("__kmax"))
    staged.crossJoin(broadcast(kMax))
      .select(col("test"), col("p_micro"), col("rank"), col("n_tests"),
        expr(s"(CAST(rank AS DECIMAL(38,0)) * ${alphaMicro}L) DIV n_tests")
          .as("threshold_micro"),
        (col("__kmax").isNotNull && col("rank") <= col("__kmax"))
          .as("selected"))
      .crossJoin(broadcast(dropped))
      .select(col("test"), col("p_micro"), col("rank"), col("n_tests"),
        col("n_dropped"), col("threshold_micro"), col("selected"))
      .orderBy(col("rank"))
  }

  /** Corpus BLEU (Papineni '02) — the n-gram overlap score for paired
    * (candidate, reference) texts: modified n-gram precision with
    * per-pair CLIP (a candidate gram counts at most as often as the
    * reference contains it — the guard against "the the the" gaming
    * unigram precision) plus the brevity penalty. The standard readout
    * for dedup-aware rewrite/decontamination passes and generation
    * evals.
    *
    * Published in −ln space as nano-quantized integers (the [[logLoss]]
    * posture — raw libm doubles are not hash-portable):
    *
    *   neg_log_bleu_nano = bp_nano + (Σ_n p{n}_nano) DIV maxN
    *
    * where p{n}_nano = round(−ln(match_n/total_n)·10⁹) ≥ 0 and bp_nano
    * = round(max(0, r/c − 1)·10⁹) (= −ln BP). Every operand in the DIV
    * is non-negative, so trunc ≡ floor cross-engine. BLEU itself is
    * exp(−neg_log_bleu_nano/10⁹) — left to the caller, because the
    * audit-grade columns are the exact integers. NULL when the corpus
    * has no candidate maxN-grams or any match_n = 0 (BLEU 0: −ln
    * diverges; the match/total columns still say why).
    *
    * Scale posture: one tokens-length aggregate plus, per n ≤ maxN, a
    * (pair, gram)-keyed counts aggregate and a counts-frame left join —
    * maxN bounded passes, grams shuffle as (id, gram, count) partials,
    * documents never pair across rows.
    *
    * Output (one row): `n_pairs`, `c_len`, `r_len`, then per n
    * `match_{n}`, `total_{n}`, `p{n}_nano` LONG, then `bp_nano`,
    * `neg_log_bleu_nano` LONG.
    */
  def bleu(df: DataFrame, id: Column, candidate: Column,
           reference: Column, maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 4, s"maxN must be in 1..4, got $maxN")
    // tokenize ONCE into attributes: the gram builder references its
    // token array n+2 times, and over a raw words(text) EXPRESSION each
    // reference re-evaluates the regex split per element — O(tokens²)
    // per row, interpreted (measured 20+ s on the 5k-doc bench corpus;
    // attribute-backed it is linear)
    val base = df.select(id.cast("string").as("__id"),
        candidate.as("__c0"), reference.as("__r0"))
      .filter(col("__id").isNotNull && col("__c0").isNotNull &&
        col("__r0").isNotNull)
      .select(col("__id"), Text.words(col("__c0")).as("__cw"),
        Text.words(col("__r0")).as("__rw"))
      // five consumers (lens + 2×maxN gram counts) read this frame —
      // materialize the tokenization once instead of re-running the
      // upstream scan + split per consumer (the globalRank discipline)
      .localCheckpoint(true)
    val lens = base.agg(count(lit(1)).as("n_pairs"),
      coalesce(sum(size(col("__cw")).cast("long")), lit(0L))
        .as("c_len"),
      coalesce(sum(size(col("__rw")).cast("long")), lit(0L))
        .as("r_len"))
    def gramCounts(tokCol: String, n: Int): DataFrame = base
      .select(col("__id"),
        explode(Text.ngramsFromTokens(col(tokCol), n)).as("__g"))
      .groupBy(col("__id"), col("__g"))
      .agg(count(lit(1)).as("__cnt"))
    def perN(n: Int): DataFrame = {
      val cc = gramCounts("__cw", n)
      val rc = gramCounts("__rw", n)
        .withColumnRenamed("__cnt", "__rcnt")
      cc.join(rc, Seq("__id", "__g"), "left_outer")
        .agg(
          coalesce(sum(least(col("__cnt"),
            coalesce(col("__rcnt"), lit(0L)))), lit(0L))
            .as(s"match_$n"),
          coalesce(sum(col("__cnt")), lit(0L)).as(s"total_$n"))
        .withColumn(s"p${n}_nano",
          when(col(s"match_$n") > 0L,
            floor(-log(col(s"match_$n").cast("double") /
              col(s"total_$n").cast("double")) * 1000000000L + 0.5)
              .cast("long")))
    }
    val joined = (1 to maxN).map(perN).foldLeft(lens)(_ crossJoin _)
    // the p-sum in the final expr is NULL-propagating by design: any
    // zero-match n NULLs the headline (BLEU 0 — −ln diverges)
    joined
      .withColumn("bp_nano",
        when(col("c_len") > 0L,
          floor(greatest(lit(0.0),
            col("r_len").cast("double") / col("c_len") - 1.0)
            * 1000000000L + 0.5).cast("long")))
      .withColumn("neg_log_bleu_nano",
        expr(s"CAST(CASE WHEN bp_nano IS NOT NULL THEN " +
          s"bp_nano + (${(1 to maxN).map(n => s"p${n}_nano")
            .mkString(" + ")}) DIV ${maxN}L END AS BIGINT)"))
      .select((col("n_pairs") +: col("c_len") +: col("r_len") +:
        (1 to maxN).flatMap(n => Seq(col(s"match_$n"), col(s"total_$n"),
          col(s"p${n}_nano"))) :+ col("bp_nano") :+
        col("neg_log_bleu_nano")): _*)
  }
}
