package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Graft

/** Dev-only stability probe for the two kNN-join bench workloads: times
  * the exact fused shapes Bench runs (warm JVM, several reps each) and an
  * assignment-only slice of the IVF path, so window drift, kernel cost
  * and cell-assignment cost can be told apart when a matched pair looks
  * off. Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.KnnBenchProbe
  */
object KnnBenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.tune(spark)
    val emb = Graft.table(spark, sfDir, "embeddings")

    def fusedQ(r: Int): DataFrame = emb
      .withColumn("__rep", explode(sequence(lit(0L), lit(r - 1L))))
      .select((col("vec_id") + (col("__rep") + 1L) * 1000000L).as("vec_id"),
        col("embedding"))

    def time(name: String, reps: Int)(mk: => DataFrame): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        println(f"[knnprobe] $name%-22s run $i: ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      }

    time("knn_join r=16", 5)(
      graft.ops.Similarity.knnJoin(emb, fusedQ(16), k = 3, nBlocks = 16))
    time("knn_join_ivf r=64", 5)(
      graft.ops.Similarity.knnJoinIvf(emb, fusedQ(64), k = 3,
        nCells = 16, nProbe = 2))
    time("knn_join_ivf salt4", 5)(
      graft.ops.Similarity.knnJoinIvf(emb, fusedQ(64), k = 3,
        nCells = 16, nProbe = 2, qSalt = 4))
    // assignment-only slice of the IVF path (both sides' nearestCells)
    time("ivf assign-only r=64", 5) {
      val cents = emb.orderBy("vec_id").limit(16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("centv"))
      val (cB, qB) = graft.ops.Similarity.ivfSides(emb, fusedQ(64), cents, 2)
      cB.unionByName(qB)
    }
    spark.stop()
  }
}
