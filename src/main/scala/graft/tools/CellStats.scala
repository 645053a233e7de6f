package graft.tools

import graft.GraftSession
import graft.operators.VectorOps
import org.apache.spark.sql.functions._

/** One-off diagnostic: SemDeDup leaf-cell population distribution over
  * the ScaleProbe synthetic embeddings — quantifies the Σ|cell|² pair
  * work te10 actually pays, and shows the hierarchical split holding
  * every leaf at or under the cap (the analogue of BucketStats for the
  * SRP fix). Usage: runMain graft.tools.CellStats <n> <nlist> <cellCap>
  */
object CellStats {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val nlist = args(1).toInt
    val cellCap = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = ScaleProbe.syntheticEmbeddings(spark, n)
    val sizes = VectorOps.semanticDedup(emb, "vec_id", "embedding",
        nlist = nlist, threshold = 0.4, cellCap = cellCap)
      .groupBy("cell").count()
    val stats = sizes.agg(
      count(lit(1)).as("n_cells"), max("count").as("max"),
      expr("percentile(count, 0.5)").as("p50"),
      expr("percentile(count, 0.99)").as("p99"),
      sum(col("count") * col("count")).as("sum_sq")).collect()(0)
    println(s"n=$n nlist=$nlist cellCap=$cellCap cells=${stats.get(0)} " +
      s"max=${stats.get(1)} p50=${stats.get(2)} p99=${stats.get(3)} " +
      s"pairwork=${stats.get(4)}")
    spark.stop()
  }
}
