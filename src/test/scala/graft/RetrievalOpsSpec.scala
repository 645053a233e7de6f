package graft

import graft.operators.RetrievalOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  test("chunkDocs covers every token with the configured overlap") {
    val text100 = (1 to 100).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text100), (2L, "a b c")).toDF("doc_id", "text")
    val chunks = RetrievalOps.chunkDocs(df, "doc_id", "text", size = 64, stride = 48)
      .select("doc_id", "chunk_id", "start", "n_tok")
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1: starts 0/48/96 with 64, 52, 4 tokens; doc 2: one short chunk
    assert(chunks == Set((1L, 0L, 0L, 64L), (1L, 1L, 48L, 52L), (1L, 2L, 96L, 4L),
      (2L, 0L, 0L, 3L)))
  }

  test("stratifiedQuota equals the per-stratum hash-order rank selection") {
    val docs = (1L to 500L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    for (quota <- Seq(5, 50, 400)) {
      val got = RetrievalOps.stratifiedQuota(docs, "doc_id", "lang", quota)
        .select("stratum", "doc_id").as[(String, Long)].collect().toSet
      val naive = docs
        .withColumn("h", (col("doc_id") * lit(2654435761L)) % lit(1000000007L))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
        .where(col("rk") <= quota)
        .select(col("lang"), col("doc_id")).as[(String, Long)].collect().toSet
      assert(got == naive, s"quota=$quota")
    }
  }

  test("stratifiedQuota is fully lazy: no Spark job (no driver collect) until the result is consumed") {
    // The boundary pick must be computed distributively — building the
    // plan may not run ANY job (the old implementation collected a
    // |strata| x 1024 histogram to the driver at call time). Also
    // covers the non-string-stratum regression: an int stratum column
    // must work end to end.
    val docs = (1L to 300L).map(i => (i, (i % 3).toInt)).toDF("doc_id", "bucket3")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val result = RetrievalOps.stratifiedQuota(docs, "doc_id", "bucket3", 10)
      Thread.sleep(500) // listener bus is async; drain before asserting
      assert(jobs.get() == 0, "stratifiedQuota ran a job during plan construction")
      assert(result.count() == 30) // int strata column works (3 strata x 10)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("property: stratifiedQuota equals the rank selection for random corpora") {
    import org.scalacheck.{Gen, Prop}
    // Random (corpus size, strata count, quota) incl. the boundary
    // shapes the histogram must get right: quota 1, quota == stratum
    // size, quota > stratum size, single-bucket strata.
    val cases = for {
      n <- Gen.choose(1, 400)
      nStrata <- Gen.choose(1, 4)
      quota <- Gen.oneOf(Gen.choose(1, 5), Gen.choose(1, n + 50))
    } yield (n, nStrata, quota)
    val prop = Prop.forAll(cases) { case (n, nStrata, quota) =>
      val docs = (1L to n.toLong)
        .map(i => (i, s"s${i % nStrata}")).toDF("doc_id", "lang")
      val got = RetrievalOps.stratifiedQuota(docs, "doc_id", "lang", quota)
        .select("stratum", "doc_id").as[(String, Long)].collect().toSet
      val naive = docs
        .withColumn("h", (col("doc_id") * lit(2654435761L)) % lit(1000000007L))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
        .where(col("rk") <= quota)
        .select(col("lang"), col("doc_id")).as[(String, Long)].collect().toSet
      got == naive
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }

  test("int8Quantize saturates at the max component and is exact on zeros") {
    val df = Seq((1L, Seq(1.0f, -0.5f, 0.0f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = RetrievalOps.int8Quantize(df, "vec_id", "embedding")
      .select("vec_id", "maxabs", "n_sat", "n_dims")
      .as[(Long, Double, Long, Long)].collect().toMap2
    assert(rows(1L) == ((1.0, 1L, 3L)))
    assert(rows(2L) == ((0.0, 0L, 2L)))
  }

  private implicit class Tup4Ops[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] = rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("rrfFuse scores docs in both lists above single-list docs") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "rk")
    val vec = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "doc_id", "rk")
    val rows = RetrievalOps.rrfFuse(lex, vec, k = 10)
      .select("doc_id", "rrf", "rk").as[(Long, Long, Int)]
      .collect().sortBy(_._3)
    // doc 11 appears in both lists (ranks 2 and 1) and must lead;
    // 10 and 12 have identical single-list scores (rank 1 lex vs
    // rank 2 vec -> 1e9/61 vs 1e9/62) so 10 (rank 1) comes second.
    assert(rows.map(_._1).toSeq == Seq(11L, 10L, 12L))
    assert(rows.head._2 == 1000000000L / 62 + 1000000000L / 61)
    assert(rows(1)._2 == 1000000000L / 61)
    assert(rows(2)._2 == 1000000000L / 62)
  }

  test("bm25TopK ranks the doc holding the rare query term first") {
    // query doc 0 mentions "zebra" (rare) and "the" (everywhere).
    val docs = Seq(
      (0L, "zebra the"),
      (1L, "zebra runs far"),
      (2L, "the the the common words here"),
      (3L, "the common words again and again"),
      (4L, "more the common filler text")
    ).toDF("doc_id", "text")
    val top = RetrievalOps.bm25TopK(docs, "doc_id", "text",
        _ === 0L, nTerms = 2, k = 3)
      .select("query_id", "doc_id", "rk").as[(Long, Long, Int)]
      .collect().sortBy(_._3).map(_._2).toSeq
    // self first (has both terms, short), then the only other zebra doc
    assert(top.head == 0L)
    assert(top(1) == 1L)
  }
}
