package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-level term statistics for training-data curation: document
  * frequency, TF-IDF term salience, top-terms-per-document.
  *
  * Scale posture (the part that matters at 100 TB):
  *  - tokenization is a narrow per-row transform pipelined with the scan;
  *  - term frequency aggregates on (doc, term) with map-side partial
  *    aggregation — the shuffle carries one row per distinct (doc, term),
  *    not one per token;
  *  - document frequency re-aggregates the tf frame on term alone
  *    (vocabulary-sized output);
  *  - the df side of the scoring join is vocabulary-sized, orders of
  *    magnitude smaller than the tf side, so Spark's size estimates (or
  *    AQE at runtime) broadcast it; the corpus-size scalar crosses as an
  *    explicit one-row broadcast;
  *  - everything downstream of tf is sized by |vocabulary| and
  *    |doc × distinct-term|, never by raw token count.
  */
object CorpusStats {

  /** Term frequency per document: one row per (doc, term) with its
    * occurrence count. Empty/null documents yield no rows. */
  def termFrequencies(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), explode(Text.words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Document frequency per term (in how many documents it appears),
    * computed from the tf frame — one row per (doc, term) — so each
    * document counts once however often the term repeats inside it. */
  def documentFrequencies(tf: DataFrame): DataFrame =
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Top-k most salient terms per document by TF-IDF with LINEAR inverse
    * document frequency: `score = tf · N / df`.
    *
    * Linear (not log) idf, deliberately: the ranking it induces per
    * document is identical to log-idf's for any monotone idf, and the
    * score stays bit-deterministic across engines — `tf·N` is integer
    * exact and the single IEEE division cannot drift, while `ln` is a
    * libm call with no cross-engine bit guarantee (SURVEY.md §2.11:
    * never gate on libm). Ties break on the term string ascending.
    *
    * Output: (idCol, term, tf, df, score, rnk) with rnk in 1..k. */
  def tfidfTopTerms(docs: DataFrame, k: Int, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = termFrequencies(docs, idCol, textCol)
    val dfreq = documentFrequencies(tf)
    val n = docs.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("__n")).cast("double") / col("df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Collocation mining: adjacent word pairs ranked by LIFT — the
    * log-free core of PMI (`PMI = log2(lift)`), kept as a raw ratio so
    * the score is engine-exact:
    *
    *   lift(w1,w2) = (c12 / M) / ((c1/N)·(c2/N)) = c12·N² / (M·c1·c2)
    *
    * where c12 counts the bigram, c1/c2 the unigrams, N total tokens, M
    * total bigrams. All five operands are exact integers, so the score
    * is ONE IEEE division — bit-identical in any engine — and the
    * ranking is the same as PMI's (log is monotone). High-lift pairs
    * are the corpus' multi-word expressions ("hong kong"); a
    * training-data pipeline uses them for tokenizer vocab candidates
    * and boilerplate discovery.
    *
    * Scale shape: bigram extraction is a narrow zip of the token array
    * with its own tail (no self-join, no posexplode matching — the
    * classic adjacent-pair join is replaced by an in-row `zip_with`);
    * then two hash aggregations (bigram counts, unigram counts) with
    * map-side combine, carrying one row per DISTINCT n-gram, and a
    * vocabulary-sized broadcast join to attach c1/c2. `minCount` prunes
    * the hapax tail before the join — at web scale that is the
    * difference between a vocabulary-sized frame and a corpus-sized
    * one.
    *
    * Output: (w1, w2, c12, c1, c2, lift), lift rounded via the caller's
    * contract (raw double here — callers round for display). */
  def collocations(docs: DataFrame, minCount: Long,
                   textCol: String = "text"): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = docs.select(Text.words(col(textCol)).as("ws"))
    // in-row adjacent pairs: zip ws[0..n-2] with ws[1..n-1]
    val tail1 = greatest(size(col("ws")) - 1, lit(0))
    val pairs = toks.select(explode(zip_with(
      slice(col("ws"), lit(1), tail1),
      slice(col("ws"), lit(2), tail1),
      (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))

    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totals = uni.agg(sum(col("c")).as("n_tokens"))
    val big = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val mTotal = pairs.agg(count(lit(1)).as("m_bigrams"))

    // lift in DOUBLE: the integer product c12·N² overflows i64 once the
    // corpus passes ~10⁹ tokens. The expression tree is fixed
    // left-to-right, so any IEEE-754 engine reproduces the exact bits —
    // the oracle writes the same parenthesization.
    big
      .join(broadcast(uni.select(col("w").as("w1"), col("c").as("c1"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c2"))), "w2")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(mTotal))
      .withColumn("lift",
        col("c12").cast("double") * col("n_tokens") * col("n_tokens") /
          (col("m_bigrams").cast("double") * col("c1") * col("c2")))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        col("lift"))
  }

  /** Inverted index (posting lists) — the retrieval-side artifact a
    * corpus pipeline ships next to BM25 (q76): per term, document
    * frequency, collection frequency, and the ordered (doc, position)
    * posting list. Postings are CAPPED at `maxPostings` occurrences
    * (by (doc, position) order, `truncated` flagged): stopword terms
    * at web scale have corpus-sized posting lists, and the cap turns
    * the worst key from O(corpus) into O(cap) — the WindowGroupLimit
    * rank-≤-k cut applies BELOW the exchange, so map tasks never ship
    * a stopword's full stream to one reducer. Shard a full production
    * index by term range; the stats pass here is already the shape
    * that sharding partitions on.
    *
    * Postings serialize as "doc:pos,doc:pos,…" — engine-neutral (the
    * oracle reproduces the string exactly), and numerically ordered
    * before formatting so lexicographic accidents can't reorder them. */
  def invertedIndex(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    maxPostings: Int = 64): DataFrame = {
    require(maxPostings >= 1, s"maxPostings must be >= 1, got $maxPostings")
    val tok = docs.select(col(idCol).as("d"),
        posexplode(Text.words(col(textCol))).as(Seq("tpos", "term")))
    val stats = tok.groupBy(col("term"))
      .agg(countDistinct(col("d")).as("df"), count(lit(1)).as("cf"))
    val capped = Relational.topKPerKey(tok, Seq("term"), maxPostings,
      Seq(col("d"), col("tpos")))
    val posts = capped.groupBy(col("term"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("d"), col("tpos")))),
        s => concat(s.getField("d").cast("string"), lit(":"),
          s.getField("tpos").cast("string"))), ",").as("postings"))
    stats.join(posts, "term")
      .withColumn("truncated", (col("cf") > maxPostings).cast("int"))
  }

  /** Order-independent content checksum per group — the release-manifest
    * integrity line: a corpus fingerprint any engine can recompute and
    * diff without moving the data. Each row contributes the first 60
    * bits of `md5(value)` (md5 is standardized, so DuckDB/Trino/pandas
    * all reproduce it); the group digest is both the SUM (as
    * DECIMAL(38,0) — overflow-free to 10¹⁹ rows) and the XOR of those
    * contributions. Sum and xor are commutative and associative, so the
    * checksum is independent of row order, partitioning, and engine —
    * and INCREMENTALLY MAINTAINABLE: append-only deltas just add/xor
    * in; two releases differ iff their digests differ (up to 2⁻⁶⁰
    * collisions per pair).
    *
    * One map-side-combined aggregate; shuffle = #groups rows. Output:
    * (`grp`, `n_rows`, `n_hashed` — null values hash nothing,
    * `sum60` DECIMAL(38,0), `xor60` LONG). */
  /** EXACT all-pairs sparse cosine similarity join over TF-IDF-weighted
    * token vectors (APSS, the Bayardo et al. '07 problem) — the
    * token-space member of the similarity-join family (set-Jaccard has
    * [[graft.operators.TextDedup.prefixFilterJoin]], dense embeddings
    * have `Similarity.cosineNearDups`): weighting by rarity makes two
    * documents similar because they share CONTENT words, where plain
    * Jaccard lets boilerplate stopwords dominate.
    *
    * Engine-exact arithmetic: weights are integer
    * `tf · (10⁶·N DIV df)` (linear idf — same ranking as log idf, no
    * libm; the [[tfidfTopTerms]] rationale), dots and squared norms are
    * EXACT integer sums in DECIMAL(38,0) (the `correlationMatrix`
    * pattern — DuckDB mirrors in HUGEINT), and the cosine is
    * `dot / (sqrt(na)·sqrt(nb))` — three correctly-rounded IEEE ops on
    * exact integers, so the score and the threshold verdict are
    * bit-identical on any engine and any layout.
    *
    * Scale posture: candidates come from the term-keyed self-join —
    * fan-out Σ_t df(t)², dominated by the df tail. `maxDf` excludes
    * terms with df > maxDf from CANDIDATE GENERATION (the standard
    * high-frequency cut); the dot products of surviving pairs are then
    * recomputed over the FULL weight vectors (scan pruned to candidate
    * ids), so reported scores stay exact — what the cut can lose is
    * only pairs sharing NOTHING but ultra-common terms, whose tf-idf
    * cosine is far below any dedup threshold by construction.
    * `maxDf = 0` disables the cut (fully exact, quadratic in df).
    *
    * Output: (id_a, id_b, n_shared, cos_sim) for pairs with
    * cos_sim ≥ threshold, id_a < id_b. */
  def sparseCosineJoin(docs: DataFrame, threshold: Double,
                       maxDf: Long = 0L,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold in (0, 1], got $threshold")
    val tf = termFrequencies(docs, idCol, textCol)
    val dfreq = documentFrequencies(tf)
    val n = docs.agg(count(lit(1)).as("__n"))
    // the weight frame feeds BOTH join sides, the norm aggregate, and
    // (with the df cut) the exact-recompute pass — a lazy local
    // checkpoint materializes it once on first use instead of
    // re-deriving tokenize→tf→df per consumer (4-5 corpus re-scans at
    // 100 TB); lazy, so merely composing the operator costs nothing
    val weights = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        (col("tf") * expr("(1000000L * __n) DIV df")).as("w"),
        col("df"))
      .localCheckpoint(false)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val norms = weights.groupBy(col(idCol))
      .agg(sum(dec(col("w")) * dec(col("w"))).as("n2"))

    val wa = weights.select(col(idCol).as("id_a"), col("term"),
      col("w").as("__wa"), col("df"))
    val wb = weights.select(col(idCol).as("id_b"), col("term"),
      col("w").as("__wb"), col("df").as("__dfb"))
    val joined =
      if (maxDf > 0L)
        wa.filter(col("df") <= maxDf)
          .join(wb.filter(col("__dfb") <= maxDf), "term")
      else wa.join(wb, "term")
    val cand = joined
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("long").as("n_shared"),
        sum(dec(col("__wa")) * dec(col("__wb"))).as("dot"))

    // with the df cut on, candidate dots miss the cut terms — recompute
    // over the full vectors, scan pruned to candidate ids
    val exact =
      if (maxDf > 0L) {
        val pairIds = cand.select("id_a", "id_b")
        pairIds
          .join(weights.select(col(idCol).as("id_a"), col("term"),
            col("w").as("__wa")), "id_a")
          .join(weights.select(col(idCol).as("id_b"), col("term"),
            col("w").as("__wb")), Seq("id_b", "term"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).cast("long").as("n_shared"),
            sum(dec(col("__wa")) * dec(col("__wb"))).as("dot"))
      } else cand

    exact
      .join(norms.select(col(idCol).as("id_a"), col("n2").as("__na")), "id_a")
      .join(norms.select(col(idCol).as("id_b"), col("n2").as("__nb")), "id_b")
      .withColumn("cos_sim", col("dot").cast("double") /
        (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_shared"), col("cos_sim"))
  }

  /** Domain-level boilerplate line mining — the trafilatura/CCNet-style
    * template stripper for crawled corpora: a line (nav bar, cookie
    * banner, copyright footer) that appears in a large FRACTION of a
    * domain's documents is template, not content, and pre-training
    * pipelines drop it before any quality scoring or dedup (otherwise
    * the template dominates n-gram stats and near-dup similarity).
    *
    * A line counts once per document that CONTAINS it (presence, not
    * occurrences), and is boilerplate within its domain when
    * `doc_freq ≥ minDocs` and `doc_freq/n_docs ≥ minFracPpm` — the
    * fraction gate compared in exact integers
    * (`1e6·doc_freq ≥ minFracPpm·n_docs`), never floats.
    *
    * Scale posture: the line stream is a narrow per-row generator; the
    * presence counts aggregate on (domain, line) with map-side combine —
    * the shuffle carries one row per distinct (domain, line), and the
    * surviving boilerplate set is tiny (lines frequent within a domain),
    * so the strip-side join broadcasts under AQE.
    *
    * Output: (`domain`, `line`, `doc_freq`, `n_docs`, `frac_ppm`). */
  def boilerplateLines(docs: DataFrame, domainCol: String,
                       textCol: String = "text",
                       minDocs: Long = 3L,
                       minFracPpm: Long = 500000L): DataFrame = {
    val lines = docs
      .select(col(domainCol).as("domain"),
        explode(array_distinct(split(coalesce(col(textCol), lit("")), "\n")))
          .as("line"))
    val perDomain = docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"))
    lines
      .groupBy(col("domain"), col("line"))
      .agg(count(lit(1)).as("doc_freq"))
      .join(perDomain, "domain")
      .filter(col("doc_freq") >= minDocs &&
        col("doc_freq") * lit(1000000L) >= lit(minFracPpm) * col("n_docs"))
      .select(col("domain"), col("line"), col("doc_freq"), col("n_docs"),
        (col("doc_freq") * lit(1000000L) / col("n_docs")).cast("long")
          .as("frac_ppm"))
  }

  /** Strip the [[boilerplateLines]] of each document's domain, keeping
    * surviving lines in their original order. Every input row survives
    * (a fully-boilerplate document becomes the empty string — dropping
    * is the CALLER's policy, e.g. gate on `n_kept`).
    *
    * The line explode carries (id, pos, line); the anti-join against the
    * mined set is an equi-join on (domain, line) — boilerplate-set-sized
    * build side, broadcast under AQE; reassembly is one id-keyed
    * aggregate whose order comes from sorting the (pos, line) structs
    * INSIDE the row (`array_sort` of the collected structs — no
    * order-dependent aggregation, so any partitioning gives the same
    * string).
    *
    * Output: (`id`, `domain`, `text_clean`, `n_kept`, `n_dropped`). */
  def stripBoilerplate(docs: DataFrame, domainCol: String,
                       textCol: String = "text",
                       idCol: String = "doc_id",
                       minDocs: Long = 3L,
                       minFracPpm: Long = 500000L): DataFrame = {
    val bp = boilerplateLines(docs, domainCol, textCol, minDocs, minFracPpm)
      .select(col("domain"), col("line"), lit(true).as("__bp"))
    val exploded = docs
      .select(col(idCol), col(domainCol).as("domain"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("pos", "line")))
    exploded
      .join(bp, Seq("domain", "line"), "left_outer")
      .groupBy(col(idCol), col("domain"))
      .agg(
        array_sort(collect_list(when(col("__bp").isNull,
          struct(col("pos"), col("line"))))).as("__kept"),
        count(col("__bp")).as("n_dropped"))
      .select(col(idCol), col("domain"),
        array_join(transform(col("__kept"), _.getField("line")), "\n")
          .as("text_clean"),
        size(col("__kept")).cast("long").as("n_kept"),
        col("n_dropped"))
  }

  /** Exact phrase search over the corpus: documents containing the words
    * of `phrase` CONSECUTIVELY (tokenization = `Text.words`, the engine's
    * standard lowercase/whitespace rule). Matches are found by joining
    * each phrase word's positional postings shifted into the head word's
    * frame — the classic positional-intersection of an IR engine, here
    * directly over the token stream.
    *
    * Scale posture: each branch filters `term = wᵢ` BEFORE its shuffle,
    * so the k−1 (id, pos)-keyed equi-joins carry only the phrase words'
    * postings (Zipf-bounded, tiny vs the corpus), and the token generate
    * is narrow and pipelined with the scan. For a repeated-query
    * workload, build [[invertedIndex]] once and intersect its postings
    * instead of re-streaming the corpus per phrase.
    *
    * Output: (`id`, `n_matches`, `first_pos` — 0-based head-word
    * position of the earliest match), one row per matching document. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val tok = docs.select(col(idCol),
      posexplode(Text.words(col(textCol))).as(Seq("pos", "term")))
    def postings(w: String, shift: Int): DataFrame =
      tok.filter(col("term") === w)
        .select(col(idCol), (col("pos") - shift).as("pos"))
    val matches = phrase.zipWithIndex.tail.foldLeft(postings(phrase.head, 0)) {
      case (acc, (w, i)) => acc.join(postings(w, i), Seq(idCol, "pos"))
    }
    matches.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"), min(col("pos")).as("first_pos"))
  }

  def contentChecksum(df: DataFrame, group: Column, value: Column): DataFrame = {
    val h = conv(substring(md5(value.cast("string")), 1, 15), 16, 10)
      .cast("long")
    // sum60 is carried exactly in DECIMAL(38,0) and published mod 2^63 so
    // the digest column is BIGINT on every engine (DuckDB would otherwise
    // widen sum(BIGINT) to int128 and serialize a different type).
    val two63 = lit(new java.math.BigDecimal("9223372036854775808"))
    df.select(group.as("grp"), h.as("__h"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), count(col("__h")).as("n_hashed"),
        (sum(col("__h").cast("decimal(38,0)")) % two63).cast("long")
          .as("sum60"),
        bit_xor(col("__h")).as("xor60"))
  }

  /** Good–Turing frequency-of-frequencies: N_r = how many distinct
    * terms occur exactly r times, with the Turing smoothed count
    * r* = (r+1)·N_{r+1}/N_r in ppm — the unseen-mass diagnostic behind
    * vocabulary-growth estimates (N_1/T is the Good–Turing probability
    * that the NEXT token is a new type) and LM smoothing tables.
    *
    * Scale posture: the token stream collapses to term counts (a
    * vocabulary-sized, map-side-combined aggregate), term counts
    * collapse to (r, N_r) — and since Σ r·N_r = T, the number of
    * distinct r values is ≤ √(2T): the final ordered window (for the
    * N_{r+1} lead) runs over a PROVABLY sub-√ frame, not data.
    * r*_ppm uses truncating integer DIV — engine-exact.
    *
    * Output: `r` LONG, `n_terms` LONG, `r_star_ppm` LONG (NULL when
    * N_{r+1} = 0 — the estimate is undefined there, never faked as 0),
    * total order by r.
    */
  /** Vocabulary growth curve: per period, how many NEW distinct terms
    * first appear, plus the cumulative vocabulary — the Heaps-law
    * diagnostic behind "is the crawl still finding new language"
    * and tokenizer-vocab sizing (compose with [[freqOfFreqs]]: N₁/T
    * says how much is STILL unseen).
    *
    * Scale posture: the token stream collapses to (term → first
    * period) via ONE min-aggregate (map-side combined, vocabulary-
    * sized), then a periods-sized count + running sum (the window runs
    * over |periods| rows — bounded by the time axis, not data).
    *
    * Output: `period` LONG, `new_terms` LONG, `vocab` LONG
    * (cumulative), total order by period. Periods with no new terms
    * but with tokens still appear (new_terms 0) — absence of novelty
    * is the signal.
    */
  def vocabGrowth(docs: DataFrame, period: Column,
                  textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(period.cast("long").as("__p"),
        explode(Text.words(col(textCol))).as("__t"))
      .filter(col("__p").isNotNull)
    val firstSeen = toks.groupBy(col("__t"))
      .agg(min(col("__p")).as("period"))
    val newPerPeriod = firstSeen.groupBy(col("period"))
      .agg(count(lit(1)).as("new_terms"))
    val periods = toks.select(col("__p").as("period")).distinct()
    val w = BoundedWindow.ordered(col("period"), col("period")) // |periods| rows — bounded axis
    periods.join(newPerPeriod, Seq("period"), "left_outer")
      .withColumn("new_terms", coalesce(col("new_terms"), lit(0L)))
      .withColumn("vocab", sum(col("new_terms")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("period")
  }

  def freqOfFreqs(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(explode(Text.words(col(textCol))).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__r"))
      .groupBy(col("__r").as("r")).agg(count(lit(1)).as("n_terms"))
    val w = BoundedWindow.ordered(col("r"), col("r")) // ≤ √(2T) rows by construction
    counts
      .withColumn("__next",
        when(lead(col("r"), 1).over(w) === col("r") + 1L,
          lead(col("n_terms"), 1).over(w)))
      .withColumn("r_star_ppm",
        when(col("__next").isNotNull,
          expr("((r + 1L) * 1000000L * __next) DIV n_terms")))
      .drop("__next")
      .orderBy("r")
  }

  /** OOV-rate audit for a top-V vocabulary: per document, the share of
    * token OCCURRENCES that a V-entry frequency-ranked vocabulary would
    * miss — the tokenizer-sizing diagnostic ("how much of the corpus
    * does a 32k vocab actually cover, and which docs are full of
    * holes"). Vocabulary = top V terms by corpus frequency, ties broken
    * by term ASC (deterministic); per-doc `oov_ppm` is a truncating
    * integer ratio.
    *
    * Shape: one (doc, term) tf aggregate (map-side combined), a
    * vocabulary rank via [[graft.operators.Relational.globalRank]]
    * (range exchange — never a single-partition ORDER BY window), the
    * V-bounded vocab broadcast back onto the tf frame, and a doc
    * aggregate. Docs with zero tokens are excluded (no defined rate).
    * Output: `doc_id`, `n_tokens`, `n_oov`, `oov_ppm` LONG; total
    * order by doc id. */
  def oovRate(docs: DataFrame, vocabSize: Int, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    val tf = termFrequencies(docs, idCol, textCol)
    val freq = tf.groupBy(col("term")).agg(sum(col("tf")).as("__cf"))
    val vocab = Relational.globalRank(freq,
        Seq(col("__cf").desc, col("term").asc))
      .filter(col("rank") <= vocabSize)
      .select(col("term"))
    tf.join(broadcast(vocab.withColumn("__in", lit(true))), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        coalesce(sum(when(col("__in").isNull, col("tf"))), lit(0L))
          .as("n_oov"))
      .withColumn("oov_ppm", expr("(1000000L * n_oov) DIV n_tokens"))
      .orderBy(idCol)
  }

  /** Term burstiness: collection frequency over document frequency —
    * `burst_ppm = cf·10⁶ DIV df` — the "when it appears, does it
    * SWARM" signal that separates topical/boilerplate terms (high
    * burst: appearing docs are saturated) from evenly-sprinkled
    * function words. The cheap screen feeding boilerplate discovery
    * and tokenizer vocab curation. `minDf` prunes the hapax tail
    * before ranking; top `k` by (burst DESC, term) — total order.
    *
    * Shape: the (doc, term) tf aggregate re-aggregated on term alone
    * (vocabulary-sized), then TakeOrdered on the k rows. Output:
    * `term`, `cf`, `df`, `burst_ppm` LONG. */
  def burstiness(docs: DataFrame, k: Int, minDf: Long = 2L,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    require(k >= 1 && minDf >= 1, "k, minDf must be >= 1")
    termFrequencies(docs, idCol, textCol)
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("cf"), count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .withColumn("burst_ppm", expr("(1000000L * cf) DIV df"))
      .orderBy(col("burst_ppm").desc, col("term").asc)
      .limit(k)
  }

  /** Corpus diversity report: the distribution of pairwise shingle
    * Jaccard over a document SAMPLE — the mode-collapse alarm for
    * synthetic/augmented corpora (a generator looping on itself drives
    * mean pairwise similarity up long before exact dedup fires; Zhu's
    * self-BLEU serves the same role, built here from the engine's
    * existing shingle machinery so it replays exactly).
    *
    * Pass a BOUNDED sample (the caller picks it — deterministic id
    * range or [[graft.operators.Sampling]]): all C(n,2) pairs are the
    * denominator, so the metric is only as meaningful as the sample is
    * representative, and the shingle-digest equi-join's cost tracks
    * shared shingles, never the corpus.
    *
    * Exact integer: per-doc DISTINCT shingle sets (the codegen
    * [[graft.plans.HashImpl.hashedShingles]] — 8-byte hashes shuffle,
    * never text, and no n-gram string ever materializes);
    * sharing pairs get `jacc_ppm = 10⁶·c DIV (|a|+|b|−c)`; non-sharing
    * pairs contribute 0 to the mean without being enumerated. Docs with
    * zero shingles (empty text) are outside the universe — visible in
    * `n_docs` only through their absence, never fake-zero pairs.
    *
    * Output (ONE row): `n_docs`, `n_pairs_total` = C(n,2),
    * `n_pairs_sharing`, `mean_jaccard_ppm` (over ALL pairs, truncating;
    * NULL when < 2 docs), `max_jaccard_ppm` (0 when no pair shares),
    * `n_pairs_half` (jaccard > 50%, the near-dup-pressure count). */
  def diversityReport(docs: DataFrame, id: Column, text: Column,
                      n: Int = 3, maxDocs: Long = 10000L): DataFrame = {
    // codegen hashed shingles: identity is all Jaccard needs, and the
    // expression never materializes the n-gram strings (already
    // distinct per doc — no array_distinct pass)
    val sets = docs
      .select(id.cast("long").as("__id"),
        explode(graft.plans.HashExprs.hashedShingles(docs.sparkSession,
          text, n)).as("__h"))
    // bounded-sample contract made LOUD: the shingle equi-join below is
    // quadratic in per-shingle doc co-occurrence, so calling this on a
    // full corpus would quietly plan a pair explosion. The guard is an
    // EAGER bounded probe — limit(maxDocs+1) short-circuits the scan at
    // maxDocs+1 id-only rows whatever the corpus size — so misuse fails
    // here, BEFORE the join is ever planned into a job. Raise maxDocs
    // deliberately if a larger sample is intended.
    val probed = docs.select(id)
      .limit(math.min(maxDocs + 1L, Int.MaxValue.toLong).toInt).count()
    require(probed <= maxDocs,
      s"diversityReport: input has > $maxDocs docs (maxDocs=$maxDocs) — " +
        "the all-pairs shingle join is quadratic; pass a bounded sample " +
        "or raise maxDocs explicitly")
    val sizes = sets.groupBy(col("__id")).agg(count(lit(1)).as("__sz"))
    val uni = broadcast(sizes.agg(count(lit(1)).as("n_docs")))
    val a = sets.select(col("__id").as("__ia"), col("__h"))
    val b = sets.select(col("__id").as("__ib"), col("__h"))
    val common = a.join(b, "__h").filter(col("__ia") < col("__ib"))
      .groupBy(col("__ia"), col("__ib")).agg(count(lit(1)).as("__c"))
    val jacc = common
      .join(sizes.select(col("__id").as("__ia"), col("__sz").as("__sa")), "__ia")
      .join(sizes.select(col("__id").as("__ib"), col("__sz").as("__sb")), "__ib")
      .select(expr("(1000000L * __c) DIV (__sa + __sb - __c)").as("__j"))
    jacc.agg(
        count(lit(1)).as("n_pairs_sharing"),
        coalesce(sum(col("__j")), lit(0L)).as("__jsum"),
        coalesce(max(col("__j")), lit(0L)).as("max_jaccard_ppm"),
        coalesce(sum(when(col("__j") > 500000L, 1L).otherwise(0L)), lit(0L))
          .as("n_pairs_half"))
      .crossJoin(uni)
      .select(col("n_docs"),
        expr("(n_docs * (n_docs - 1)) DIV 2").as("n_pairs_total"),
        col("n_pairs_sharing"),
        expr("""CASE WHEN n_docs >= 2
               | THEN __jsum DIV ((n_docs * (n_docs - 1)) DIV 2) END"""
          .stripMargin).as("mean_jaccard_ppm"),
        col("max_jaccard_ppm"), col("n_pairs_half"))
  }

  /** Vocabulary richness report — Chao1 (Chao '84) with Good–Turing
    * unseen mass: ONE row answering "how much vocabulary haven't we
    * crawled yet", the coverage question [[vocabGrowth]] plots over
    * time and [[freqOfFreqs]] histograms without summarizing:
    *
    *   chao1 = V + f₁²/(2f₂)      (f₂ > 0)
    *         = V + f₁(f₁−1)/2    (the bias-corrected f₂ = 0 form)
    *   P₀    = f₁/N              (Good–Turing unseen probability mass)
    *
    * with V = observed vocabulary, f₁/f₂ = singleton/doubleton counts,
    * N = token occurrences. All published numbers are exact truncating
    * integer arithmetic — no float enters.
    *
    * Shape: tokenization pipelined with the scan, one term-keyed count
    * (map-side combined, |vocab| shuffle rows), one tiny
    * freq-of-freq-style aggregate → ONE row. Output: `n_tokens`,
    * `vocab`, `f1`, `f2`, `chao1_est`, `unseen_mass_ppm` LONG. */
  def richness(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(explode(Text.words(col(textCol))).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
    counts.agg(
        coalesce(sum(col("__c")), lit(0L)).as("n_tokens"),
        count(lit(1)).as("vocab"),
        coalesce(sum(when(col("__c") === 1L, 1L).otherwise(0L)), lit(0L))
          .as("f1"),
        coalesce(sum(when(col("__c") === 2L, 1L).otherwise(0L)), lit(0L))
          .as("f2"))
      .withColumn("chao1_est",
        when(col("f2") > 0L,
          col("vocab") + expr("(f1 * f1) DIV (2L * f2)"))
          .otherwise(col("vocab") + expr("(f1 * (f1 - 1L)) DIV 2L")))
      .withColumn("unseen_mass_ppm",
        when(col("n_tokens") > 0L, expr("(1000000L * f1) DIV n_tokens"))
          .otherwise(lit(0L)))
      .select(col("n_tokens"), col("vocab"), col("f1"), col("f2"),
        col("chao1_est"), col("unseen_mass_ppm"))
  }

  /** Zipf tail index of the term-frequency distribution — the Hill
    * maximum-likelihood estimator of the power-law exponent over the
    * frequency tail (Hill '75; Clauset–Shalizi–Newman '09 survey):
    *
    *   α = 1 + m / Σ_{c ≥ xMin} ln(c / xMin)
    *
    * A natural-text corpus sits near α ≈ 2 (Zipf); templated/synthetic
    * corpora drift — a one-number drift alarm on the whole vocabulary
    * shape, complementing [[freqOfFreqs]] (the raw histogram this
    * summarizes) and [[burstiness]] (per-term concentration).
    *
    * Determinism: counts are exact longs; each ln is one pinned IEEE
    * sequence, quantized floor-micro and summed as LONGS (order-free —
    * a float Σ over the vocabulary would flap with aggregation order),
    * then α = 1 + m·10⁶ / Σ_upm, one IEEE division of exact integers.
    *
    * Shape: tokenization pipelined with the scan, one term-keyed count
    * aggregate (map-side combined, shuffle carries |vocab| rows), ONE
    * one-row aggregate over the tail. Output (one row): `n_terms`
    * (vocabulary size), `x_min` LONG (the threshold used), `m_tail`
    * LONG (terms with count ≥ xMin), `sum_ln_upm` LONG (the audit
    * surface), `alpha` DOUBLE (NULL when the tail is empty or has zero
    * log-mass — degenerate fit, never 0/0). */
  def zipfTailIndex(docs: DataFrame, textCol: String = "text",
                    xMin: Long = 5L): DataFrame = {
    require(xMin >= 1L, s"xMin must be >= 1, got $xMin")
    val counts = docs
      .select(explode(Text.words(col(textCol))).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
    counts.agg(
        count(lit(1)).as("n_terms"),
        lit(xMin).as("x_min"),
        coalesce(sum(when(col("__c") >= xMin, 1L).otherwise(0L)), lit(0L))
          .as("m_tail"),
        coalesce(sum(when(col("__c") >= xMin,
          floor(log(col("__c").cast("double") / xMin) * 1000000L + 0.5)
            .cast("long"))), lit(0L)).as("sum_ln_upm"))
      .withColumn("alpha",
        when(col("sum_ln_upm") > 0L,
          lit(1.0) + (col("m_tail") * 1000000L).cast("double") /
            col("sum_ln_upm")))
      .select(col("n_terms"), col("x_min"), col("m_tail"),
        col("sum_ln_upm"), col("alpha"))
  }

  /** Tokenizer fertility per language slice — chars/token, bytes/token
    * and bytes/char: the numbers that size a tokenizer budget across
    * languages (a whitespace "token" of Chinese carries ~3 UTF-8 bytes
    * per char and several words' worth of content; a fixed token budget
    * silently over- or under-samples languages unless these ratios are
    * on the mixture dashboard).
    *
    * Tokens are the corpus convention (q21): whitespace-split,
    * lowercased, empties dropped. All ratios are truncating ppm
    * quotients of exact LONG sums (positive — engine-safe), NULL when
    * the denominator is 0 (an all-whitespace slice reports NULL
    * fertility, never a fake 0).
    *
    * Scale posture: one projection computing three per-doc integers +
    * one map-side-combined aggregate per language; nothing else
    * shuffles. NULL lang/text rows are dropped (the corpus gate
    * upstream owns quarantine).
    *
    * Output: `lang`, `n_docs`, `n_tokens`, `n_chars`, `n_bytes` LONG,
    * `chars_per_token_ppm`, `bytes_per_token_ppm`, `bytes_per_char_ppm`
    * LONG-or-NULL — total order by lang.
    */
  def fertility(docs: DataFrame, lang: Column, text: Column): DataFrame = {
    val base = docs.select(lang.cast("string").as("lang"),
        text.cast("string").as("__t"))
      .filter(col("lang").isNotNull && col("__t").isNotNull)
      .select(col("lang"),
        size(filter(split(lower(col("__t")), "\\s+"),
          x => length(x) > 0)).cast("long").as("__tok"),
        length(col("__t")).cast("long").as("__ch"),
        octet_length(col("__t")).cast("long").as("__by"))
    base.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("__tok")), lit(0L)).as("n_tokens"),
        coalesce(sum(col("__ch")), lit(0L)).as("n_chars"),
        coalesce(sum(col("__by")), lit(0L)).as("n_bytes"))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_bytes"),
        when(col("n_tokens") > 0L,
          expr("(n_chars * 1000000L) DIV n_tokens"))
          .as("chars_per_token_ppm"),
        when(col("n_tokens") > 0L,
          expr("(n_bytes * 1000000L) DIV n_tokens"))
          .as("bytes_per_token_ppm"),
        when(col("n_chars") > 0L,
          expr("(n_bytes * 1000000L) DIV n_chars"))
          .as("bytes_per_char_ppm"))
      .orderBy(col("lang"))
  }

  /** Capture–recapture population estimate (Chapman '51) — "how many
    * entities exist that NEITHER crawl saw?": two overlapping
    * independent samples of the same population give
    *
    *   N̂ = (n₁+1)·(n₂+1) DIV (m+1) − 1
    *
    * (Chapman's bias-corrected Lincoln–Petersen; the +1s make the
    * estimator finite even at m = 0 and the quotient positive, hence
    * trunc ≡ floor cross-engine). The corpus-coverage companion to
    * [[richness]]: Chao1 extrapolates from WITHIN-sample frequency-
    * of-frequencies, capture–recapture from BETWEEN-sample overlap —
    * when the two disagree wildly, the independence assumption (or the
    * dedup keying) is broken, which is exactly worth knowing.
    *
    * Scale posture: each side collapses to distinct keys (one
    * aggregate), the overlap is a semi-join count — three key-sized
    * shuffles, no windows. The raw Lincoln–Petersen n₁·n₂ DIV m is
    * published too (NULL at m = 0, never ±∞).
    *
    * Output (one row): `n1`, `n2`, `m`, `seen`, `chapman_est`,
    * `unseen_est` LONG, `lincoln_est` LONG-or-NULL.
    */
  def captureRecapture(a: DataFrame, b: DataFrame, idA: Column,
                       idB: Column): DataFrame = {
    val da = a.select(idA.cast("string").as("__k"))
      .filter(col("__k").isNotNull).distinct()
    val db = b.select(idB.cast("string").as("__k"))
      .filter(col("__k").isNotNull).distinct()
    val n1 = da.agg(count(lit(1)).as("n1"))
    val n2 = db.agg(count(lit(1)).as("n2"))
    val m = da.join(db, Seq("__k"), "left_semi")
      .agg(count(lit(1)).as("m"))
    n1.crossJoin(n2).crossJoin(m)
      .withColumn("seen", col("n1") + col("n2") - col("m"))
      .withColumn("chapman_est", expr(
        "(CAST(n1 + 1 AS DECIMAL(38,0)) * (n2 + 1)) DIV (m + 1) - 1")
        .cast("long"))
      .withColumn("unseen_est", col("chapman_est") - col("seen"))
      .withColumn("lincoln_est",
        when(col("m") > 0L, expr(
          "CAST((CAST(n1 AS DECIMAL(38,0)) * n2) DIV m AS BIGINT)")))
      .select(col("n1"), col("n2"), col("m"), col("seen"),
        col("chapman_est"), col("unseen_est"), col("lincoln_est"))
  }
}
