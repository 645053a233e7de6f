package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding-vector primitives for similarity search over an
  * `array<float>` column: exact cosine (brute-force baseline) and a
  * sign-random-projection LSH bucketing for the at-scale path.
  * Dot products fold left-to-right in double precision (deterministic,
  * and reproducible by the oracle's list_sum/list_transform).
  */
object VectorOps {

  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity of two double vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** All pairs (id_a < id_b) with cosine ≥ threshold — exact brute force,
    * norms computed once per vector. O(n²) in pairs: the correctness
    * baseline; use lshBuckets to prune at scale.
    */
  def cosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val n = vecs.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = n.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Exact top-k neighbors for each query vector (brute force + window). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = q.join(c, col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rk"))
  }

  /** Sign-random-projection bucket id (nbits hyperplanes whose components
    * are derived from xxhash64(bit, dim) — data-independent and
    * deterministic). Vectors in the same bucket are cosine-close with
    * high probability; probe multiple buckets (hamming-1 neighbors) for
    * higher recall. This is the 100 TB path: join on bucket instead of
    * all-pairs.
    */
  def srpBucket(vec: Column, dim: Int, nbits: Int): Column = {
    val bits = (0 until nbits).map { bIdx =>
      // hyperplane component h_{bIdx,d} in {-1,+1} from a fixed hash
      val proj = (0 until dim).map { d =>
        when(pmod(xxhash64(lit(bIdx * 7919 + d)), lit(2)) === 0, lit(1.0))
          .otherwise(lit(-1.0)) * element_at(vec, d + 1).cast("double")
      }.reduce(_ + _)
      when(proj >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << bIdx)
    }
    bits.reduce(_ + _)
  }
}
