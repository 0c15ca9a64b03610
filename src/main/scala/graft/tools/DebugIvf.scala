package graft.tools
import org.apache.spark.sql.SparkSession
import graft.core.Graft
object DebugIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Graft.table(spark, "/root/testdata/sf0.01", "embeddings")
    val out = graft.ops.Similarity.ivfTopKTrained(emb,
      emb.where(org.apache.spark.sql.functions.col("vec_id") < 5), 10, 16, 2, 2)
    out.show(3)
    spark.stop()
  }
}
