package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM-training-data pipelines, all as
  * codegen-friendly Catalyst built-in compositions (no UDFs) so they run
  * inside whole-stage codegen and scale to 100 TB document corpora.
  *
  * These go beyond the reference surface (north-star extensions,
  * BASELINE.json) but reuse its philosophy: null-safe, coerce-don't-error.
  */
object Text {

  /** Lowercased whitespace tokens; empty/null text -> empty array. */
  def tokens(c: Column): Column =
    when(c.isNull || trim(c) === "", array().cast("array<string>"))
      .otherwise(split(trim(lower(c)), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish subword count: word pieces + digits + punctuation, the classic
    * GPT-2-style pre-tokenizer shape (public pattern family). Counts matches
    * of letter-runs / digit-runs / single non-space symbols.
    */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(coalesce(c, lit("")),
      lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Stopword lists for the n-gram-free language-ID heuristic. Tiny,
    * high-frequency function words per language — public linguistics
    * knowledge, good enough for corpus routing.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "para", "por", "con"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "他")
  )

  /** Count of tokens that appear in `words` (frequency-weighted, not
    * distinct). aggregate() folds left over the token array — deterministic.
    */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    aggregate(
      toks,
      lit(0L),
      (acc, t) => acc + when(t.isInCollection(words), 1L).otherwise(0L))

  /** Language ID: argmax of per-language stopword hit counts; ties and
    * zero-hit rows -> "und" (undetermined). Deterministic tie-break by
    * requiring a strict winner in language-name order.
    */
  def languageId(text: Column): Column = languageIdFromTokens(tokens(text))

  /** Token-parameterized variant: callers that materialize the token array
    * once (e.g. TextAnalysis.profile) avoid re-splitting per sub-expression.
    */
  def languageIdFromTokens(toks: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scores = langs.map(l => struct(stopwordHits(toks, stopwords(l)).as("hits"),
      lit(l).as("lang")))
    // array_max on struct(hits, lang): orders by hits then lang (both asc) —
    // ties resolve to the lexicographically last language, deterministically.
    val best = array_max(array(scores: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Heuristic quality signals: char length, token count, punctuation ratio,
    * stopword ratio, mean token length. Returns a struct column.
    */
  def qualityStruct(text: Column): Column =
    qualityStructFromTokens(text, tokens(coalesce(text, lit(""))))

  /** Token-parameterized variant (see [[languageIdFromTokens]]). */
  def qualityStructFromTokens(text: Column, toks: Column): Column = {
    val t = coalesce(text, lit(""))
    val nChars = length(t).cast("double")
    val nToks = size(toks).cast("double")
    val nPunct = size(regexp_extract_all(t, lit("[.,;:!?'\"()\\[\\]{}]"), lit(0))).cast("double")
    val allHits = stopwordHits(toks, stopwords.values.flatten.toSeq)
    struct(
      nChars.cast("long").as("n_chars"),
      nToks.cast("long").as("n_tokens"),
      when(nChars > 0, nPunct / nChars).otherwise(lit(0.0)).as("punct_ratio"),
      when(nToks > 0, allHits.cast("double") / nToks).otherwise(lit(0.0)).as("stopword_ratio"),
      when(nToks > 0, (nChars - nToks + 1) / nToks).otherwise(lit(0.0)).as("mean_token_len")
    )
  }

  /** Composite quality score in [0,1]: rewards stopword presence and sane
    * token lengths, penalizes punctuation soup and very short docs.
    */
  def qualityScore(text: Column): Column =
    qualityScoreFromStruct(qualityStruct(text))

  /** Score from an already-computed [[qualityStruct]] column. */
  def qualityScoreFromStruct(q: Column): Column = {
    val lenScore = least(q.getField("n_tokens").cast("double") / 50.0, lit(1.0))
    val punctScore = greatest(lit(1.0) - q.getField("punct_ratio") * 5.0, lit(0.0))
    val stopScore = least(q.getField("stopword_ratio") * 4.0, lit(1.0))
    round((lenScore + punctScore + stopScore) / 3.0, 6)
  }

  /** Word k-shingles (contiguous k-grams joined by space); docs shorter than
    * k words yield a single shingle of the whole text. Distinct-ified.
    */
  def wordShingles(text: Column, k: Int): Column = {
    require(k >= 1, "shingle size must be >= 1")
    val toks = tokens(text)
    val n = size(toks)
    // Zip k shifted copies of the token array rather than slicing inside a
    // lambda: a lambda-body reference to the token array re-evaluates the
    // regex split per element (no CSE in interpreted higher-order
    // functions), turning shingling O(n^2); this form does O(k) splits/row.
    val shifted = (0 until k).map(j => slice(toks, lit(j + 1), n))
    val grams = shifted.reduceRight((a, b) =>
      zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
    // zip_with pads the short arrays' tails with nulls -> null shingles;
    // keep only the first n-k+1 (the complete k-grams).
    val full = slice(grams, lit(1), greatest(n - (k - 1), lit(0)))
    val short = array(concat_ws(" ", toks)) // < k words: one whole-text shingle
    array_distinct(
      when(n === 0, array().cast("array<string>"))
        .when(n < k, short)
        .otherwise(full))
  }

  /** Training-data text cleaning (C4-style, public recipe family): drop
    * URLs and emails, collapse whitespace runs, trim, lowercase. Pure
    * regexp built-ins — codegen'd, oracle-reproducible.
    */
  def cleanForTraining(text: Column): Column = {
    val noUrl = regexp_replace(coalesce(text, lit("")), "https?://\\S+", " ")
    val noEmail = regexp_replace(noUrl, "\\S+@\\S+", " ")
    lower(trim(regexp_replace(noEmail, "\\s+", " ")))
  }

  /** Positional rolling-hash document fingerprint: sum over tokens of
    * (stableHash(token) mod 1e6) * (position+1), mod 2^31. Order-sensitive
    * (unlike a bag-of-words hash) yet oracle-reproducible in pure SQL.
    */
  def fingerprint(text: Column): Column = fingerprintFromTokens(tokens(text))

  /** Token-parameterized variant (see [[languageIdFromTokens]]). */
  def fingerprintFromTokens(toks: Column): Column = {
    val positioned = zip_with(
      toks,
      sequence(lit(1), greatest(size(toks), lit(1))),
      (t, i) => (StableHash.hash60(t) % 1000000L) * i.cast("long"))
    val h = pmod(aggregate(positioned, lit(0L), (acc, x) => acc + x), lit(2147483647L))
    when(size(toks) === 0, lit(0L)).otherwise(h)
  }
}
