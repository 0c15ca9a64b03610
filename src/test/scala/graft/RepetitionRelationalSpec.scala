package graft

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.ops.TextAnalysis

/** Contract: the relational repetition operator is output-identical to the
  * map-side HOF form on every input shape (that equality is what lets both
  * corpus queries share one oracle).
  */
class RepetitionRelationalSpec extends SparkSpec {
  import spark.implicits._

  private def hofForm(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), Text.linesOf(col("text")).as("ls"),
        Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        Text.repetitionFromParts(col("ls"), col("toks")).as("r"))
      .select(col("doc_id"), col("r.n_lines").as("n_lines"),
        col("r.dup_line_frac").as("dup_line_frac"),
        col("r.dup_line_char_frac").as("dup_line_char_frac"),
        col("r.top_bigram_frac").as("top_bigram_frac"))

  test("relational == HOF on planted shapes") {
    val docs = Seq(
      (1L, "one line\ntwo line\none line\nthree line"), // dup line
      (2L, "spam spam spam spam spam"),                 // one hot bigram
      (3L, "all distinct lines\nhere now\nclean prose today"),
      (4L, ""),                                          // empty
      (5L, null.asInstanceOf[String]),                   // null
      (6L, "single"),                                    // no bigrams
      (7L, "a\na\na\na"),                                // all dup lines
      (8L, "  padded \n\n\n padded  \nx")                // blank + trim dups
    ).toDF("doc_id", "text")
    val a = hofForm(docs).orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.repetitionSignalsRelational(docs)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("relational == HOF on a generated corpus, any partitioning") {
    val docs = (0L until 300L).map { i =>
      val words = (0 until (i % 40).toInt).map(j => s"w${(i + j) % 11}")
      (i, words.grouped(5).map(_.mkString(" ")).mkString("\n"))
    }.toDF("doc_id", "text")
    val a = hofForm(docs).orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.repetitionSignalsRelational(docs.repartition(7))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
