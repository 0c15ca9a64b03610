package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Unigram-LM scoring semantics + the MathLn parity contract. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("MathLn equals java.lang.Math.log through codegen") {
    val xs = Seq(1.0, 0.5, 999.0 / 50000, 1e-12, 7.25, 0.0199986)
    val out = xs.toDF("x")
      .select(graft.plans.MathLn(col("x")).as("y"))
      .as[Double].collect()
    assert(out.toSeq == xs.map(java.lang.Math.log))
    // the motivating case: StrictMath differs here
    assert(java.lang.Math.log(999.0 / 50000) !=
      StrictMath.log(999.0 / 50000))
  }

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug"),
    (3L, "zyzzyva qwertyuiop"), // rare tokens -> low score
    (4L, ""),
    (5L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("rare-token docs score below common-token docs; empty docs are NULL") {
    val res = TextAnalysis.unigramLmScores(docs).orderBy("doc_id").collect()
    val score = res.map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val n = res.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n(1L) == 6 && n(3L) == 2 && n(4L) == 0 && n(5L) == 0)
    assert(score(4L).isEmpty && score(5L).isEmpty)
    assert(score(3L).get < score(1L).get)
    assert(score(3L).get < score(2L).get)
  }

  test("score equals the hand-computed mean token log-prob") {
    val one = Seq((1L, "a a b")).toDF("doc_id", "text")
    val s = TextAnalysis.unigramLmScores(one).head
    // model: P(a)=2/3, P(b)=1/3; ordered fold: (0 + 2*ln(2/3)) + 1*ln(1/3)
    val expect = ((0.0 + 2.0 * math.log(2.0 / 3.0)) + math.log(1.0 / 3.0)) / 3.0
    assert(s.getLong(1) == 3L)
    assert(s.getDouble(2) == expect)
  }

  test("deterministic under repartitioning") {
    val wide = (0L until 200L).map(i => (i, s"tok${i % 17} tok${i % 5} shared words"))
    val a = TextAnalysis.unigramLmScores(wide.toDF("doc_id", "text").repartition(1))
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.unigramLmScores(wide.toDF("doc_id", "text").repartition(13))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("bigram LM: scrambled word order scores below natural order") {
    // 10 fluent docs establish "the cat" / "cat sat" as common transitions;
    // the scrambled doc uses the SAME words in an order never seen
    val fluent = (10L until 20L).map(i => (i, "the cat sat on the mat"))
    val d = (fluent :+ (1L, "mat the on sat cat the"))
      .toDF("doc_id", "text")
    val res = TextAnalysis.bigramLmScores(d).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(res(1L) < res(10L)) // unigram LM would score these EQUAL
    // sanity on counts: 6 tokens -> 5 bigrams
    val nb = TextAnalysis.bigramLmScores(d).where(col("doc_id") === 1)
      .select("n_bigrams").collect().head.getLong(0)
    assert(nb == 5L)
  }

  test("bigram LM: single-token and empty docs yield zero bigrams, null score") {
    val d = Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val res = TextAnalysis.bigramLmScores(d).orderBy("doc_id").collect()
    assert(res(0).getLong(1) == 0L && res(0).isNullAt(2))
    assert(res(1).getLong(1) == 0L && res(1).isNullAt(2))
    assert(res(2).getLong(1) == 1L && res(2).getDouble(2) == math.log(1.0))
  }

  test("deterministic sampling: stable membership, stratified rates, consistent joins") {
    import graft.ops.Sampling
    val docs = (0L until 2000L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val s1 = Sampling.bernoulli(docs, "id", 0.3).select("id").as[Long].collect().toSet
    val s2 = Sampling.bernoulli(docs.repartition(7), "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2) // layout-independent (df.sample is not)
    assert(math.abs(s1.size - 600) < 80) // ~30%
    // monotone: a smaller fraction is a SUBSET of a larger one
    val s3 = Sampling.bernoulli(docs, "id", 0.1).select("id").as[Long].collect().toSet
    assert(s3.subsetOf(s1))
    // stratified: absent stratum uses default 0 -> dropped entirely
    val st = Sampling.stratified(docs, "src", Map("src0" -> 1.0, "src1" -> 0.5), "id")
      .select("id", "src").collect()
    assert(st.count(_.getString(1) == "src0") == 500) // rate 1.0 keeps all
    assert(!st.exists(r => r.getString(1) == "src2" || r.getString(1) == "src3"))
    val k = Sampling.uniformK(docs, "id", 37).count()
    assert(k == 37)
  }

  test("DSIR weights rank target-like docs above off-target docs") {
    // target slice speaks "alpha beta"; the raw remainder speaks
    // "gamma delta". A target-exclusive feature has ct == cr, so its
    // log-ratio is ln((Tr+B)/(Tt+B)) > 0; an off-target feature's ct = 0
    // pulls its ratio down — target-like docs must outscore off-target.
    val corpus = ((0L until 20L).map(i => (i, "alpha beta alpha", true)) ++
      (20L until 60L).map(i => (i, "gamma delta gamma", false)) ++
      Seq((60L, "", false), (61L, null.asInstanceOf[String], false)))
      .toDF("doc_id", "text", "is_tgt")
    val w = TextAnalysis.dsirWeights(corpus, col("is_tgt"))
      .orderBy("doc_id").collect()
    val byId = w.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 3 unigrams + 2 bigrams per 3-token doc
    assert(byId(0L) == byId(19L) && byId(0L)._1 == 5L)
    assert(byId(0L)._2 > byId(20L)._2,
      s"target doc ${byId(0L)} must outweigh off-target ${byId(20L)}")
    assert(byId(0L)._2 > 0L && byId(20L)._2 < 0L)
    // featureless docs: zero features, zero weight (non-null)
    assert(byId(60L) == ((0L, 0L)) && byId(61L) == ((0L, 0L)))
  }

  test("DSIR weights are layout-independent and all-integer stable") {
    val docs = (0L until 300L).map(i =>
      (i, s"tok${i % 23} tok${i % 7} shared words here", i % 5 == 0))
      .toDF("doc_id", "text", "is_tgt")
    val a = TextAnalysis.dsirWeights(docs.repartition(1), col("is_tgt"))
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.dsirWeights(docs.repartition(13), col("is_tgt"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
