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

  /** Per-document profile (map-side only; no shuffle). */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val q = Text.qualityStruct(t)
    docs.select(
      col("doc_id"),
      Text.languageId(t).as("lang_pred"),
      q.getField("n_chars").as("n_chars"),
      q.getField("n_tokens").as("n_tokens"),
      Text.bpeTokenCount(t).as("n_bpe_tokens"),
      round(q.getField("punct_ratio"), 6).as("punct_ratio"),
      round(q.getField("stopword_ratio"), 6).as("stopword_ratio"),
      Text.qualityScore(t).as("quality_score"),
      Text.fingerprint(t).as("fingerprint"))
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
