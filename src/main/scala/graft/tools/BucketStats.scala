package graft.tools

import graft.GraftSession
import graft.operators.VectorOps
import org.apache.spark.sql.functions._

/** One-off diagnostic: SRP bucket-population distribution over the
  * ScaleProbe synthetic embeddings, at a given corpus size and nbits —
  * quantifies the Σ|bucket|² pair work the te11 probe actually pays.
  * Usage: runMain graft.tools.BucketStats <n> <nbits>
  */
object BucketStats {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val nbits = args(1).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = ScaleProbe.syntheticEmbeddings(spark, n)
    val sizes = emb
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
      .withColumn("bucket", VectorOps.srpBucket(col("v"), nbits))
      .groupBy("bucket").count()
    val stats = sizes.agg(
      count(lit(1)).as("n_buckets"), max("count").as("max"),
      expr("percentile(count, 0.5)").as("p50"),
      expr("percentile(count, 0.99)").as("p99"),
      sum(col("count") * col("count")).as("sum_sq")).collect()(0)
    println(s"n=$n nbits=$nbits buckets=${stats.get(0)} max=${stats.get(1)} " +
      s"p50=${stats.get(2)} p99=${stats.get(3)} pairwork=${stats.get(4)}")
    spark.stop()
  }
}
