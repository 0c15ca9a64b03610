package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness (the PassagesProbe discipline): window-form vs
  * kernel-form sessionization on the bench's fused shape (16
  * user-disjoint replicas of sf0.1 events), same JVM, warmed, min of 3,
  * plus an exact parity check. Recorded result (SCALE.md): kernel
  * 0.0690 s/instance vs window 0.0895 — the corpus entry and bench run
  * the kernel; w2_sessionize keeps the window form as the
  * window-function-tier demonstration.
  */
object SessAbProbe {
  /** args: [dataDir] [cpus] [reps] — defaults match the bench environment
    * on the build box (the recorded 0.0690/0.0895 numbers in SCALE.md are
    * box-specific; re-run with your own dir/parallelism elsewhere).
    */
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = args.lift(1).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val r = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Graft.tune(spark)
    val gapUs = 8L * 3600 * 1000000L
    def ev = graft.core.Graft.spread(
        graft.core.Graft.table(spark, d, "events")
          .where(col("user_id").isNotNull && col("ts").isNotNull)
          .select("user_id", "ts", "event_id"))
      .withColumn("__rep", explode(sequence(lit(0L), lit(r - 1L))))
      .select((col("user_id") * r + col("__rep")).as("user_id"),
        expr("ts DIV 1000").as("ts_us"), col("event_id"))
    def window() = graft.ops.Sessionize
      .batchSessionStats(ev, "user_id", "ts_us", "event_id", gapUs)
      .select(col("user_id"), col("start_ts").as("session_start_us"),
        (col("end_ts") + gapUs).as("session_end_us"), col("n_events"))
      .orderBy("user_id", "session_start_us")
    def kernel() = graft.ops.Sessionize
      .sessionStatsKernel(ev, "user_id", "ts_us", "event_id", gapUs)
      .select(col("user_id"), col("start_ts").as("session_start_us"),
        (col("end_ts") + gapUs).as("session_end_us"), col("n_events"))
      .orderBy("user_id", "session_start_us")
    def time(mk: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.queryExecution.toRdd.count(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    def kernelNoSort() = graft.ops.Sessionize
      .sessionStatsKernel(ev, "user_id", "ts_us", "event_id", gapUs)
      .select(col("user_id"), col("start_ts").as("session_start_us"),
        (col("end_ts") + gapUs).as("session_end_us"), col("n_events"))
    def evOnly() = ev
    // warm
    time(window()); time(kernel()); time(kernelNoSort()); time(evOnly())
    val w = (1 to 3).map(_ => time(window())).min
    val k = (1 to 3).map(_ => time(kernel())).min
    val kn = (1 to 3).map(_ => time(kernelNoSort())).min
    val e0 = (1 to 3).map(_ => time(evOnly())).min
    println(f"WINDOW=${w}%.3f KERNEL=${k}%.3f NOSORT=${kn}%.3f EV=${e0}%.3f per-instance w=${w/r}%.4f k=${k/r}%.4f kn=${kn/r}%.4f")
    // parity
    val a = window().collect().map(_.toSeq).toSeq
    val b = kernel().collect().map(_.toSeq).toSeq
    println(s"PARITY=${a == b} rows=${a.size}")
    spark.stop()
  }
}
