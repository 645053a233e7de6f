package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the ScaleProbe synthetic embeddings:
  * component-distribution sanity (distinct values, mean, fraction of
  * all-equal vectors) to explain SRP bucket skew.
  */
object EmbCheck {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = ScaleProbe.syntheticEmbeddings(spark, n)
    val ex = emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
    ex.agg(countDistinct("x").as("distinct_x"), avg("x").as("mean_x"),
        stddev("x").as("sd_x")).show()
    // top duplicate full vectors
    emb.groupBy(col("embedding")).count().orderBy(desc("count")).limit(5)
      .select(col("count"), element_at(col("embedding"), 1).as("c0"),
        element_at(col("embedding"), 2).as("c1")).show()
    spark.stop()
  }
}
