package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SparkSessionExtensions entry point: exposes the engine's native
  * expressions AND its flagship operators (dedup, ANN, quality gate) to
  * SQL users.
  *
  * Activate with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`; then
  * `SELECT hash60(col), dot_product(a, b) FROM ...` runs the codegen'd
  * natives, and the table-valued functions make whole operators
  * scriptable end-to-end:
  *
  * {{{
  *   SELECT * FROM graft_dedup_exact('documents', 'text', 'doc_id');
  *   SELECT * FROM graft_minhash_pairs('documents', 'text', 'doc_id', 0.7);
  *   SELECT * FROM graft_fuzzy_dedup('documents', 'text', 'doc_id', 0.7);
  *   SELECT * FROM graft_knn_join('embeddings', 'embeddings', 10, 16);
  *   SELECT * FROM graft_knn_join_ivf('embeddings', 'embeddings', 10, 16, 2);
  *   SELECT * FROM graft_quality_gate('documents', 'text');
  *   SELECT * FROM graft_asof_join('views', 'purchases', 'user_id', 'ts_us', 'pval');
  *   SELECT * FROM graft_segment_dedup('documents', 'text', 'doc_id', ' table ', 25);
  * }}}
  *
  * Each TVF resolves its table-name literals against the session catalog
  * at analysis time and splices the operator's own logical plan into the
  * query — the SQL surface IS the library operator (same plan, same
  * scale shape, same oracle), not a reimplementation.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litVal(args: Seq[Expression], i: Int, fn: String): Any =
    args(i) match {
      case Literal(v, _) if v != null => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a non-null literal, got $other")
    }
  private def litStr(args: Seq[Expression], i: Int, fn: String): String =
    litVal(args, i, fn).toString
  private def litInt(args: Seq[Expression], i: Int, fn: String): Int =
    litVal(args, i, fn) match {
      case n: Number => n.intValue()
      case v => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal, got $v")
    }
  private def litDouble(args: Seq[Expression], i: Int, fn: String): Double =
    litVal(args, i, fn) match {
      case n: Number => n.doubleValue()
      case v => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a numeric literal, got $v")
    }

  /** The operator's own logical plan, spliced into the outer query; the
    * analyzer resolves the inner table reference against the catalog.
    */
  private def plan(df: DataFrame): LogicalPlan = df.queryExecution.logical

  private def tvf(e: SparkSessionExtensions, name: String, usage: String)(
      build: (SparkSession, Seq[Expression]) => LogicalPlan): Unit =
    e.injectTableFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft.plans.GraftExtensions", name),
      (args: Seq[Expression]) => build(SparkSession.active, args)))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("hash60"),
      new ExpressionInfo(classOf[Hash60].getName, "hash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "hash60(expr) takes one argument")
        Hash60(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "strip_accents(expr) takes one argument")
        StripAccents(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "jaro_winkler(a, b) takes two arguments")
        JaroWinkler(args.head, args(1))
      }))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b) takes two arguments")
        DotProduct(args.head, args(1))
      }))

    tvf(e, "graft_dedup_exact",
      "graft_dedup_exact(table, text_col, id_col)") { (sp, args) =>
      require(args.length == 3, "graft_dedup_exact(table, text_col, id_col)")
      val fn = "graft_dedup_exact"
      plan(graft.ops.Dedup.exact(sp.table(litStr(args, 0, fn)),
        litStr(args, 1, fn), litStr(args, 2, fn)))
    }

    tvf(e, "graft_minhash_pairs",
      "graft_minhash_pairs(table, text_col, id_col, threshold)") { (sp, args) =>
      require(args.length == 4,
        "graft_minhash_pairs(table, text_col, id_col, threshold)")
      val fn = "graft_minhash_pairs"
      plan(graft.ops.Dedup.minhashPairs(sp.table(litStr(args, 0, fn)),
        litStr(args, 1, fn), litStr(args, 2, fn),
        threshold = litDouble(args, 3, fn)))
    }

    // The one-call exact -> LSH-banded -> verify -> components -> keep-one
    // composite (Dedup.fuzzyDedup) — the operator a SQL-only user most
    // wants as a single statement: returns the input table's surviving
    // rows (one representative per near-dup cluster).
    tvf(e, "graft_fuzzy_dedup",
      "graft_fuzzy_dedup(table, text_col, id_col, threshold)") { (sp, args) =>
      require(args.length == 4,
        "graft_fuzzy_dedup(table, text_col, id_col, threshold)")
      val fn = "graft_fuzzy_dedup"
      plan(graft.ops.Dedup.fuzzyDedup(sp.table(litStr(args, 0, fn)),
        litStr(args, 1, fn), litStr(args, 2, fn),
        threshold = litDouble(args, 3, fn)))
    }

    tvf(e, "graft_knn_join",
      "graft_knn_join(corpus_table, query_table, k, n_blocks)") { (sp, args) =>
      require(args.length == 4,
        "graft_knn_join(corpus_table, query_table, k, n_blocks)")
      val fn = "graft_knn_join"
      plan(graft.ops.Similarity.knnJoin(sp.table(litStr(args, 0, fn)),
        sp.table(litStr(args, 1, fn)),
        k = litInt(args, 2, fn), nBlocks = litInt(args, 3, fn)))
    }

    tvf(e, "graft_knn_join_ivf",
      "graft_knn_join_ivf(corpus_table, query_table, k, n_cells, n_probe)") { (sp, args) =>
      require(args.length == 5,
        "graft_knn_join_ivf(corpus_table, query_table, k, n_cells, n_probe)")
      val fn = "graft_knn_join_ivf"
      plan(graft.ops.Similarity.knnJoinIvf(sp.table(litStr(args, 0, fn)),
        sp.table(litStr(args, 1, fn)),
        k = litInt(args, 2, fn), nCells = litInt(args, 3, fn),
        nProbe = litInt(args, 4, fn)))
    }

    tvf(e, "graft_quality_gate",
      "graft_quality_gate(table, text_col)") { (sp, args) =>
      require(args.length == 2, "graft_quality_gate(table, text_col)")
      val fn = "graft_quality_gate"
      plan(graft.ops.TextAnalysis.qualityGate(sp.table(litStr(args, 0, fn)),
        litStr(args, 1, fn)))
    }

    // keys/payload column lists arrive as comma-separated literals (TVF
    // arguments must be scalar literals); whitespace around names is
    // tolerated.
    tvf(e, "graft_asof_join",
      "graft_asof_join(left_table, right_table, keys_csv, ts_col, payload_csv)") { (sp, args) =>
      require(args.length == 5,
        "graft_asof_join(left_table, right_table, keys_csv, ts_col, payload_csv)")
      val fn = "graft_asof_join"
      def cols(i: Int) =
        litStr(args, i, fn).split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
      plan(graft.ops.AsOfJoin.asOf(sp.table(litStr(args, 0, fn)),
        sp.table(litStr(args, 1, fn)),
        keys = cols(2), tsCol = litStr(args, 3, fn), payloadCols = cols(4)))
    }

    tvf(e, "graft_segment_dedup",
      "graft_segment_dedup(table, text_col, id_col, sep, max_doc_freq)") { (sp, args) =>
      require(args.length == 5,
        "graft_segment_dedup(table, text_col, id_col, sep, max_doc_freq)")
      val fn = "graft_segment_dedup"
      plan(graft.ops.Dedup.segmentDedup(sp.table(litStr(args, 0, fn)),
        litStr(args, 1, fn), litStr(args, 2, fn),
        sep = litStr(args, 3, fn),
        maxDocFreq = litVal(args, 4, fn) match {
          case n: Number => n.longValue()
          case v => throw new IllegalArgumentException(
            s"$fn: argument 5 must be an integer literal, got $v")
        }))
    }
  }
}
