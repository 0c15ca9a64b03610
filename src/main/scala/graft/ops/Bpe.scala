package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training — the classic
  * subword-vocabulary construction (public algorithm: Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"): start
  * from characters, repeatedly merge the corpus's most frequent adjacent
  * symbol pair.
  *
  * Spark-first shape: training runs over the DISTINCT word vocabulary with
  * corpus frequencies (the standard trick — corpus size drops out after the
  * first word count, so a 100 TB corpus trains from a vocabulary table that
  * is millions of rows, not trillions). Each round is one map-side pair
  * explode + one hash aggregate + a 1-row argmax collect (the merge
  * decision is inherently a driver-loop control point — it is k rounds of
  * O(vocab) work, not an unbounded iteration); the symbol re-write is a
  * map-side fold. The evolving vocabulary is localCheckpoint'ed every few
  * rounds so plan lineage stays flat ([[Dedup.clusterNearDups]]'s
  * discipline for iterative operators).
  */
object Bpe {

  /** Word -> weighted adjacent symbol-pair stats for ONE round, over a
    * (symbols array, cnt) vocabulary. Pure map + one aggregate.
    */
  def pairStats(vocab: DataFrame): DataFrame = {
    val n = size(col("sym"))
    val idx = when(n >= 2, sequence(lit(1), n - 1))
      .otherwise(array().cast("array<int>"))
    vocab
      .select(col("cnt"), explode(transform(idx,
        i => struct(element_at(col("sym"), i).as("a"),
          element_at(col("sym"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("weight"))
  }

  /** Replace every non-overlapping left-to-right occurrence of the
    * adjacent pair (a, b) in a symbol array with the merged symbol a+b —
    * the BPE re-write step, as a single fold over the indices (map-side,
    * no UDF; the struct state carries a skip flag for the consumed
    * right-hand symbol).
    */
  def mergePair(sym: Column, a: String, b: String): Column = {
    val n = size(sym)
    val folded = aggregate(
      sequence(lit(1), n),
      struct(array().cast("array<string>").as("acc"), lit(false).as("skip")),
      (st, i) => {
        val cur = element_at(sym, i)
        val isPair = i < n && cur === a && element_at(sym, i + 1) === b
        when(st.getField("skip"),
          struct(st.getField("acc").as("acc"), lit(false).as("skip")))
          .otherwise(when(isPair,
            struct(concat(st.getField("acc"), array(lit(a + b))).as("acc"),
              lit(true).as("skip")))
            .otherwise(
              struct(concat(st.getField("acc"), array(cur)).as("acc"),
                lit(false).as("skip"))))
      },
      st => st.getField("acc"))
    when(n >= 1, folded).otherwise(sym)
  }

  /** Character-split seed vocabulary from a corpus: distinct words with
    * frequencies, symbols = characters. One corpus pass; everything after
    * runs on the vocabulary table.
    */
  def seedVocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.core.Graft.spread(docs)
      .select(explode(graft.functions.Text.tokens(col(textCol))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"), split(col("word"), "").as("sym"))

  /** Learn `nMerges` BPE merges. Deterministic argmax per round: weight
    * desc, then (a, b) ascending — ties resolve identically on any
    * cluster. Returns the ordered merge list and the final symbolized
    * vocabulary.
    */
  def learnBpe(vocab0: DataFrame, nMerges: Int): (Seq[(String, String)], DataFrame) = {
    var vocab = vocab0.localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    while (round < nMerges) {
      val top = pairStats(vocab)
        .orderBy(col("weight").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) round = nMerges // no pairs left anywhere
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((a, b))
        vocab = vocab.withColumn("sym", mergePair(col("sym"), a, b))
        round += 1
        // flat lineage: each round otherwise nests one more projection
        if (round % 3 == 0 || round == nMerges)
          vocab = vocab.localCheckpoint(true)
      }
    }
    (merges.result(), vocab)
  }
}
