package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Corpus-level text analysis: one narrow (shuffle-free) pass deriving
  * language, quality, token counts, and fingerprint per document. All
  * expressions are Catalyst built-ins -> whole-stage codegen'd; at 100 TB
  * this runs as a pure map over the parquet scan with full column pruning.
  */
object TextAnalysis {

  /** Per-document profile. Tokenization is materialized ONCE behind a
    * select boundary (interpreted higher-order functions don't CSE the
    * regex split across sub-expressions), then every signal derives from
    * the token array. Spread across cores first: this is pure CPU-bound
    * map work and small tables scan as one partition.
    */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val tokenized = graft.core.Graft.spread(docs)
      .select(col("doc_id"), col(textCol).as("__text"),
        Text.tokens(col(textCol)).as("__toks"))
    val t = col("__text")
    val toks = col("__toks")
    val q = Text.qualityStructFromTokens(t, toks)
    tokenized.select(
      col("doc_id"),
      Text.languageIdFromTokens(toks).as("lang_pred"),
      q.getField("n_chars").as("n_chars"),
      q.getField("n_tokens").as("n_tokens"),
      Text.bpeTokenCount(t).as("n_bpe_tokens"),
      round(q.getField("punct_ratio"), 6).as("punct_ratio"),
      round(q.getField("stopword_ratio"), 6).as("stopword_ratio"),
      Text.qualityScoreFromStruct(q).as("quality_score"),
      Text.fingerprintFromTokens(toks).as("fingerprint"))
  }

  /** Corpus rollup by predicted language (one shuffle on the tiny lang key,
    * partial aggregation map-side).
    */
  def languageSummary(docs: DataFrame, textCol: String = "text"): DataFrame =
    profile(docs, textCol)
      .groupBy("lang_pred")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        avg("quality_score").as("avg_quality"))
}
