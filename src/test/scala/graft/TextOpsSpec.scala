package graft

import graft.operators.{TextOps, VectorOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  test("wordNgrams handles short documents") {
    val df = Seq((1L, "one two"), (2L, "a b c d")).toDF("doc_id", "text")
      .withColumn("words", TextOps.words(col("text")))
      .withColumn("sh", TextOps.wordNgrams(col("words"), 3))
    val m = df.select(col("doc_id"), col("sh")).as[(Long, Seq[String])]
      .collect().toMap
    assert(m(1L).isEmpty)
    assert(m(2L) == Seq("a b c", "b c d"))
  }

  test("minhashLshPairs equals allPairsJaccard on a small corpus") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy cat again today"),
      (3L, "completely different words nothing shared at all here now"))
      .toDF("doc_id", "text")
      .withColumn("words", TextOps.words(col("text")))
      .withColumn("shingles", TextOps.wordNgrams(col("words"), 3))
    val exact = TextOps.allPairsJaccard(docs, "doc_id", "shingles", 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = TextOps.minhashLshPairs(docs, "doc_id", "shingles", 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact == Set((1L, 2L)))
    assert(lsh == exact)
  }

  test("simhash banded pairs match brute-force hamming") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "totally unrelated vocabulary set with other tokens"))
      .toDF("doc_id", "text")
      .withColumn("words", TextOps.words(col("text")))
    val sim = TextOps.simhash60(docs, "doc_id", "words").cache()
    val banded = TextOps.simhashPairs(sim, "doc_id", 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = sim.as("a").join(sim.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .where(bit_count(expr("a.simhash ^ b.simhash")) <= 3)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    assert(banded == brute)
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val pairs = VectorOps.cosinePairs(df, "vec_id", "embedding", -1.0)
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) == 0.0)
  }

  test("IVF k-means with zero Lloyd iterations equals fixed-centroid IVF") {
    val rnd = new scala.util.Random(11)
    val df = (0L until 40L).map(i =>
        (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val fitted = VectorOps.ivfKmeansTopK(df, "vec_id", "embedding",
        _ % 10 === 0, nlist = 4, nprobe = 2, k = 3, lloydIters = 0)
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    val fixed = VectorOps.ivfTopK(df, "vec_id", "embedding",
        _ % 10 === 0, nlist = 4, nprobe = 2, k = 3)
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    assert(fitted == fixed && fitted.nonEmpty)
  }

  test("IVF top-k probing ALL cells equals brute-force top-k") {
    val rnd = new scala.util.Random(7)
    val df = (0L until 40L).map(i =>
        (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val nlist = 4
    val ivf = VectorOps.ivfTopK(df, "vec_id", "embedding",
        _ % 10 === 0, nlist, nprobe = nlist, k = 3)
      .select("query_id", "vec_id", "cos", "rk")
      .as[(Long, Long, Double, Int)].collect().toSet
    val brute = VectorOps.bruteForceTopK(
        df.filter(col("vec_id") % 10 === 0), df, "vec_id", "embedding", 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(ivf == brute)
  }
}
