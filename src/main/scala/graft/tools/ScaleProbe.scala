package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-slope probe for the data-bound heavies, one notch past the sf1
  * sweep (SCALE.md): runs the four workloads whose 100 TB story rests on
  * their scaling model, engine-side only (no oracle — correctness is
  * pinned at sf0.01/sf0.1/sf1), and prints per-workload wall seconds as
  * one JSON line. Expected models, from the plan shapes:
  *
  *  - dedup_minhash  — linear in corpus bytes (map-side signatures, one
  *    (band, bucket)-keyed shuffle);
  *  - dedup_passages — linear in token count (positional grams, one
  *    gram-keyed window + one doc-keyed window);
  *  - text_profile   — linear map pass;
  *  - sim_knn_join   — QUADRATIC in rows by design (exact corpus-vs-
  *    corpus kNN: |C|·|Q| kernel work spread over blocks) — the probe
  *    confirms the n² model holds without memory collapse, not
  *    linearity;
  *  - sim_knn_join_ivf — Σ_cell |C_cell|·|Q_cell| kernel work: with the
  *    corpus entry's FIXED nCells=16 that is ~n²/16·nProbe (cells grow
  *    linearly), so the probe checks the n²-with-constant model and no
  *    collapse — production scales nCells with the corpus (√N rule,
  *    cell id as partition column) to hold per-cell size flat;
  *  - sketch_kmv_distinct — linear scan, k-bounded mergeable state;
  *  - dedup_semantic — centroid train (bounded collect) + one
  *    cell-keyed shuffle + per-cell pair scan: same fixed-cells ~n²/k
  *    model as the ivf join at probe scales.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ScaleProbe
  * [workload...] (default: the linear four). Each workload runs the
  * corpus entry exactly as SparkEntry defines it, timed over the
  * optimized plan's execution (Bench's `toRdd.count` discipline).
  */
object ScaleProbe {
  val workloads = Seq("dedup_minhash", "dedup_passages", "text_profile",
    "sim_knn_join")
  /** The round-11 additions (judge list): bench heavies with sf1 evidence
    * but no sf10 row. Run via explicit args so the default probe stays
    * the historical four.
    */
  val extendedWorkloads = Seq("sim_knn_join_ivf", "sketch_kmv_distinct",
    "dedup_semantic")

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val picked = if (args.nonEmpty) args.toSeq else workloads
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Graft.tune(spark)
    val times = picked.map { name =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.toRdd.count(): Unit
      val t = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[scale-probe] $name%-16s $t%8.1f s")
      name -> t
    }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"""{"probe":"scale","sf":"$dir","load_avg":$load%.2f,"queries":""" +
      times.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
        .mkString("{", ",", "}") + "}")
    spark.stop()
  }
}
