package graft

/** Brute-force recomputation of the two per-row signal queries that live
  * inline in SparkEntry: the bounded-lag EWMA and the character-diversity
  * fold. Both are checked for EXACT equality (the queries are built on
  * integer arithmetic with one mirrored descaling division, so the Scala
  * reference lands on the identical double).
  */
class CorpusSignalsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("w8_ewma equals a per-row 20-lag weighted-sum reference") {
    val rows = SparkEntry.queries("w8_ewma")(spark, sf).collect()
    assert(rows.nonEmpty)
    // reference: replay events per user in (us, event_id) order
    val ev = core.Graft.tsToNanos(spark.read.parquet(s"$sf/events.parquet"))
      .selectExpr("user_id", "event_id", "ts DIV 1000 AS us",
        "CAST(round(value * 100) AS BIGINT) AS vc")
      .where("ts IS NOT NULL AND event_id IS NOT NULL AND user_id <= 30")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) 0L else r.getLong(3)))
    val expect = ev.groupBy(_._1).flatMap { case (_, g) =>
      val ord = g.sortBy(t => (t._3, t._2))
      ord.indices.map { i =>
        var s = 0L
        var j = 0
        while (j < 20 && i - j >= 0) {
          s += ord(i - j)._4 * (1L << (19 - j))
          j += 1
        }
        (ord(i)._2, s.toDouble / 104857600.0)
      }
    }.toMap
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val got = r.getDouble(2)
      val want = expect(r.getLong(1))
      assert(got == want, s"event ${r.getLong(1)}: $got != $want")
    }
  }

  test("w8_ewma: a constant series converges to its value; decay halves") {
    // planted series: user with constant value v has ewma -> v * (1 - 2^-20)
    // after >= 20 observations (geometric sum of the 20 weights)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ewma").toString
    val ev = (1 to 25).map(i =>
      (i.toLong, 1000000000L + i * 1000000000L, 1L, "view", 2.0, "{}"))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("w8_ewma")(spark, dir).collect()
    val last = out.last.getDouble(2)
    // 200 cents * (2^20 - 1) / 2^20 / 100
    assert(last == 200.0 * (1048576.0 - 1.0) / 1048576.0 / 100.0)
    // first row has only the j=0 term: weight 1/2
    assert(out.head.getDouble(2) == 1.0)
  }

  test("text_char_diversity equals a per-doc codepoint-histogram reference") {
    val rows = SparkEntry.queries("text_char_diversity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val text = docs(id)
      if (text == null) {
        assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
      } else {
        val cps = text.codePoints().toArray
        val n = cps.length.toLong
        assert(r.getLong(1) == n, s"doc $id n_chars")
        if (n == 0L) {
          assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
        } else {
          val cnt = cps.groupBy(identity).map(_._2.length.toLong)
          val k = cnt.size.toLong
          val mx = cnt.max
          val ss = cnt.map(c => c * c).sum
          assert(r.getLong(2) == k, s"doc $id distinct_chars")
          assert(r.getDouble(3) == mx.toDouble / n.toDouble, s"doc $id top_frac")
          assert(r.getDouble(4) ==
            1.0 - ss.toDouble / (n * n).toDouble, s"doc $id simpson")
        }
      }
    }
  }

  test("text_char_diversity flags a repeated-char doc below a varied one") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cd").toString
    Seq((1L, "aaaaaaaaaa", "en", "src0", 10L),
        (2L, "abcdefghij", "en", "src0", 10L),
        (3L, "", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_char_diversity")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(4) == 0.0)                  // all one char
    assert(out(2L).getDouble(4) == 1.0 - 10.0 / 100.0)   // all distinct
    assert(out(1L).getDouble(3) == 1.0 && out(2L).getDouble(3) == 0.1)
    assert(out(3L).getLong(1) == 0L && out(3L).isNullAt(4)) // empty text
  }
}
