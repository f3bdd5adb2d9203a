package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting.
  *
  * Everything except the rolling-hash fingerprint is built from
  * `org.apache.spark.sql.functions` (whole-stage-codegen'd, no UDF in the
  * hot path) so the same plan scales to 100 TB: all of these are narrow,
  * per-row transforms — no shuffle, fully pipelined with the parquet scan.
  */
object Text {

  /** Whitespace tokens (lowercased). `split` on \s+ can yield a leading ""
    * for leading whitespace; filter empties for stable counts. */
  def words(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => length(w) > 0)

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(words(text))

  /** BPE-ish token estimate: letter runs, digit runs, and single
    * punctuation marks each count as one token. */
  def tokenCountRegex(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Ratio of tokens that are English stopwords — a cheap quality gate. */
  val englishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  def stopwordRatio(text: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val ws = words(text)
    val hits = size(filter(ws, w => w.isin(stopwords.map(lit): _*)))
    when(size(ws) > 0, hits.cast("double") / size(ws)).otherwise(lit(0.0))
  }

  /** Punctuation density: punctuation chars / total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      regexp_count(text, lit("[.,;:!?'\"()\\[\\]{}]")).cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Composite document quality score in [0,1]: length saturation,
    * stopword presence, low punctuation density. The exact weights are a
    * policy knob; the point is the *shape* — monotone, bounded, cheap. */
  def qualityScore(text: Column): Column = {
    val lengthScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopScore   = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctPen    = least(punctRatio(text) * 10.0, lit(1.0))
    val raw = lengthScore * 0.4 + stopScore * 0.3 + (lit(1.0) - punctPen) * 0.3
    // floor-based rounding: binary-deterministic across engines (Spark's
    // round() rounds the decimal string repr, which oracle engines don't)
    floor(raw * 10000.0 + 0.5) / 10000.0
  }

  /** Flesch reading-ease in exact integer micro-units — the classic
    * surface readability gate (news ≈ 60e6, academic ≈ 20e6, legal < 0),
    * with the standard cheap proxies: sentences = runs of [.!?] (min 1),
    * syllables = vowel-letter groups [aeiouy]+ of the lowered text (the
    * usual ±15 % heuristic — the POINT is a monotone, deterministic
    * signal, not linguistics):
    *
    *   fk_micro = 206 835 000 − (1 015 000·W) DIV S − (84 600 000·Y) DIV W
    *
    * Truncating integer divisions only, so the score is bit-identical on
    * any engine (`regexp_count` here ≡ `len(regexp_extract_all(...))`
    * there); NULL for word-less documents. Narrow — two regex counts and
    * a token count, pipelined with the scan. */
  def readabilityMicro(text: Column): Column = {
    // exact truncating division for NONNEGATIVE longs below 2^53: the
    // remainder-subtracted numerator divides exactly, so the double
    // division is exact and the cast loses nothing
    def divL(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val w = tokenCountWs(text).cast("long")
    val s = greatest(lit(1L), regexp_count(text, lit("[.!?]+")).cast("long"))
    val y = regexp_count(lower(text), lit("[aeiouy]+")).cast("long")
    when(w > 0L,
      lit(206835000L) - divL(lit(1015000L) * w, s) - divL(lit(84600000L) * y, w))
  }

  /** Language-ID via stopword-profile scoring + CJK codepoint detection —
    * the classic n-gram-profile heuristic reduced to its word-level form.
    * Pure built-ins: per-language occurrence counts, argmax via array_max
    * over (score, lang) structs (struct ordering = lexicographic, so ties
    * break deterministically on the language code). Returns ISO code or
    * 'und' when no profile matches.
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "was", "for", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "eine", "ich", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est", "pas", "que", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "es", "no", "por")
  )

  def langId(text: Column): Column = {
    val ws = words(text)
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (code, profile) =>
      struct(
        size(filter(ws, w => w.isin(profile.map(lit): _*))).as("score"),
        lit(code).as("lang"))
    }
    val best = array_max(array(scored: _*))
    val cjkCount = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
    when(cjkCount * 3 > length(text), lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** 64-bit polynomial rolling-hash fingerprint over the normalized text
    * (lowercased, whitespace collapsed). Karp-Rabin-style base-31 hash with
    * silent wraparound — implemented as a UDF because ANSI mode (Spark 4
    * default) makes built-in long arithmetic overflow-checked. Stable
    * across JVMs (no String.hashCode dependence on anything but the
    * chars).
    */
  private val rollingHash: String => Long = { s =>
    val norm = s.toLowerCase.trim.replaceAll("\\s+", " ")
    var h = 0L
    var i = 0
    while (i < norm.length) { h = h * 31L + norm.charAt(i).toLong; i += 1 }
    h
  }

  def fingerprint(text: Column): Column = {
    val f = udf(rollingHash)
    f(coalesce(text, lit("")))
  }

  /** Independent reimplementation of the SimHash62 kernel
    * (graft.plans.HashImpl.simhash62) from its spec — regex tokenization
    * + per-token FNV-1a/splitmix64 over UTF-8 bytes + bit votes — written
    * against the published constants, not by calling the kernel. Used as
    * the q29 self-oracle: the gate asserts bitwise agreement between this
    * interpreted path and the codegen'd native expression on every
    * document. */
  private val simhash62RefFn: String => Long = { s0 =>
    val tallies = new Array[Int](62)
    // lowercase through UTF8String, matching the native kernel's path
    // exactly: plain String.toLowerCase is locale-sensitive (tr-TR maps
    // 'I' to dotless 'ı'), which would fail the q29 bitwise self-oracle
    // on such JVMs while the hash reimplementation below stays fully
    // independent
    val lowered = org.apache.spark.unsafe.types.UTF8String
      .fromString(s0).toLowerCase.toString
    for (tok <- lowered.split("\\s+") if tok.nonEmpty) {
      var h = 0xcbf29ce484222325L
      for (b <- tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)) {
        h ^= (b & 0xffL)
        h *= 0x100000001b3L
      }
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      h ^= (h >>> 31)
      var bit = 0
      while (bit < 62) {
        if (((h >>> bit) & 1L) == 1L) tallies(bit) += 1 else tallies(bit) -= 1
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 62) {
      if (tallies(bit) >= 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  def simhash62Ref(text: Column): Column = {
    val f = udf(simhash62RefFn)
    f(coalesce(text, lit("")))
  }

  /** 62-bit SimHash over word tokens, as a pure column expression: per
    * token, each hash bit votes +1/-1; the final bit is the vote sign.
    * Entirely higher-order built-ins (no UDF, no explode, no shuffle) —
    * the whole signature is computed per-row inside codegen'd expressions.
    * Bits extracted via bin() → char array because shiftright's bit count
    * must be a literal, and ANSI mode forbids wrapping arithmetic.
    */
  def simhash64(text: Column): Column = {
    val nBits = 62
    def votes(w: Column): Column = {
      val chars = split(lpad(bin(xxhash64(w)), 64, "0"), "")
      transform(sequence(lit(0), lit(nBits - 1)),
        b => when(element_at(chars, lit(64) - b) === "1", 1L).otherwise(-1L))
    }
    val zero = array_repeat(lit(0L), nBits)
    val tallies = aggregate(words(text), zero,
      (acc, w) => zip_with(acc, votes(w), (a, v) => a + v))
    aggregate(
      zip_with(tallies, sequence(lit(0), lit(nBits - 1)),
        (t, b) => when(t >= 0, pow(lit(2.0), b).cast("long")).otherwise(0L)),
      lit(0L),
      (acc, v) => acc + v)
  }

  /** Multi-row generator (§2.10): split a document into fixed-size word
    * chunks (the training-data chunker). Use with
    * `posexplode(chunks(...))` for (chunk_idx, chunk_text) rows. */
  def chunks(text: Column, chunkWords: Int): Column = {
    val ws = words(text)
    val nChunks = ceil(size(ws).cast("double") / chunkWords).cast("int")
    when(size(ws) > 0,
      transform(sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(ws, i * chunkWords + 1, lit(chunkWords)))))
      .otherwise(array())
  }

  /** PII scrubbing for training corpora: replace e-mail addresses, long
    * digit runs (phone/account numbers), and IPv4 literals with typed
    * placeholder tokens. The patterns stay inside the RE2-compatible
    * subset (no backrefs or lookaround) so the same regexes run
    * identically on any engine, and `regexp_replace` is codegen'd — a
    * narrow per-row transform that pipelines with the scan.
    *
    * Order matters and is part of the contract: e-mails first (so their
    * digits aren't half-eaten by the number rule), then IPs (dotted
    * quads would otherwise match the digit rule per octet), then digit
    * runs of `minDigits`+. */
  def redactPii(text: Column, minDigits: Int = 7): Column = {
    val email = regexp_replace(text,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("<EMAIL>"))
    val ip = regexp_replace(email,
      lit("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"), lit("<IP>"))
    regexp_replace(ip, lit(s"[0-9]{$minDigits,}"), lit("<NUM>"))
  }

  /** HTML → text extraction (the CommonCrawl-pipeline boilerplate step,
    * trafilatura's core loop reduced to its deterministic skeleton).
    * Rule order is part of the contract:
    *  1. `<script>`/`<style>` BLOCKS go first, content and all — a bare
    *     tag-strip would keep `if (x<y) {}` as page text (and the `<y`
    *     would eat into the markup);
    *  2. remaining tags → space (space, not empty: `</p><p>` must not
    *     glue two words together);
    *  3. entity decode for the common set, `&amp;` LAST so a literal
    *     `&amp;lt;` correctly yields the text `&lt;`, not `<`;
    *  4. whitespace collapse + trim.
    * Patterns are RE2-safe (no backrefs/lookarounds) so engines that
    * compile regex to RE2 (DuckDB's oracle side) agree byte-for-byte.
    * Narrow per-row transform — pipelines with the scan. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(decoded, "[ \\t\\n\\r\\f]+", " "))
  }

  /** All word n-grams of a document, duplicates KEPT (contrast
    * [[shingles]], which dedups) — the unit of the within-document
    * repetition measure. Documents shorter than n words yield an empty
    * list. */
  def ngramList(text: Column, n: Int): Column =
    ngramsFromTokens(words(text), n)

  /** Word n-grams from an ALREADY-MATERIALIZED token array column.
    * Callers doing heavy gram work must tokenize into an attribute in a
    * child projection and pass that attribute here: `ws` appears n+2
    * times in this expression tree, and when it is a raw `words(text)`
    * EXPRESSION each occurrence re-evaluates the regex split per
    * element_at — O(tokens²) per row, interpreted (the q274 lesson; the
    * TextDedup HOF note is the same failure). An attribute evaluates
    * once in its own projection and is reused. */
  def ngramsFromTokens(ws: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j)): _*))
    when(size(ws) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** Within-document repetition ratio (the Gopher-style repeated-n-gram
    * quality rule): fraction of the document's word n-grams that are
    * duplicates of another occurrence, `1 − distinct/total` in [0,1).
    * 0.0 when the document has no n-grams. Bit-deterministic across
    * engines: one integer-exact division, no libm. Narrow per-row
    * transform — pipelines with the scan, no shuffle. */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val g = ngramList(text, n)
    when(size(g) > 0,
      lit(1.0) - size(array_distinct(g)).cast("double") / size(g))
      .otherwise(lit(0.0))
  }

  /** Word n-gram shingles as a distinct set — the unit of Jaccard
    * similarity and MinHash. Short documents (< n words) fall back to the
    * whole-token set so they still participate. */
  def shingles(text: Column, n: Int = 3): Column = {
    val ws = words(text)
    val grams = transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j)): _*))
    array_distinct(when(size(ws) >= n, grams).otherwise(ws))
  }

  /** Reference implementation for the native char-entropy kernel
    * (graft.plans.TextImpl.charEntropy) — same fixed ascending-char
    * summation order, so the spec can assert BITWISE equality of the
    * doubles. Returns (n_chars, distinct_chars, entropy_bits). */
  /** Reference implementation for the native CDC chunker
    * (graft.plans.TextImpl.cdcChunks) — independently re-derives the
    * splitmix64 gear table and the gear recurrence so the spec can
    * assert exact chunk equality. */
  def cdcChunksRef(s: String, minLen: Int, mask: Long, maxLen: Int): Seq[String] = {
    val gear = (0 until 256).map { i =>
      var z = (i + 1).toLong * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }.toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0; var h = 0L; var i = 0
    while (i < s.length) {
      h = (h << 1) + gear(s.charAt(i) & 0xff)
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
        out += s.substring(start, i + 1); start = i + 1; h = 0L
      }
      i += 1
    }
    if (start < s.length) out += s.substring(start)
    out.toSeq
  }

  def charEntropyRef(s: String): (Int, Int, Double) = {
    if (s.isEmpty) return (0, 0, 0.0)
    val freq = scala.collection.mutable.Map.empty[Char, Int]
    s.foreach(c => freq(c) = freq.getOrElse(c, 0) + 1)
    val sum = freq.keys.toArray.sorted
      .map(c => { val n = freq(c).toDouble; n * Math.log(n) }).sum
    val h = (Math.log(s.length.toDouble) - sum / s.length) / Math.log(2.0)
    (s.length, freq.size, h)
  }
}
