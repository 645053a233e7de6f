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

  test("max_sim_micro matches a naive per-token reference (incl. zero-norm tokens)") {
    import graft.functions.VectorExpressions.max_sim_micro
    // 2 tokens x 2 dims; candidate 20 has a zero-norm second token,
    // candidate 30 is all-zero on token 1.
    val q = Array(1.0, 0.0, 0.5, 0.5)
    val c20 = Array(0.6, 0.8, 0.0, 0.0)
    val c30 = Array(0.0, 0.0, 1.0, 1.0)
    def naive(qv: Array[Double], cv: Array[Double], w: Int): Long = {
      def nrm(v: Array[Double], o: Int) =
        math.sqrt((0 until w).map(d => math.floor(v(o + d) * v(o + d) * 1e12).toLong).sum / 1e12)
      (0 until qv.length / w).map { i =>
        val qn = nrm(qv, i * w)
        if (qn == 0.0) 0L
        else {
          val ms = (0 until cv.length / w).flatMap { j =>
            val cn = nrm(cv, j * w)
            if (cn == 0.0) None
            else {
              val dot = (0 until w).map(d =>
                math.floor(qv(i * w + d) * cv(j * w + d) * 1e12).toLong).sum
              Some(math.floor(dot / 1e12 / (qn * cn) * 1e6).toLong)
            }
          }
          if (ms.isEmpty) 0L else ms.max
        }
      }.sum
    }
    val got = Seq((10L, q, c20), (11L, q, c30))
      .toDF("id", "qv", "cv")
      .select($"id", max_sim_micro($"qv", $"cv", 2).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(got(10L) == naive(q, c20, 2))
    assert(got(11L) == naive(q, c30, 2))
    // sanity: q token 1 aligns exactly with c20 token 1 direction (cos<1
    // only via the floor scaling), so the score is near 1e6 + best of token 2
    assert(got(10L) >= 900000L)
  }

  test("mmrRerank greedy matches a naive reference and prefers diversity") {
    // query 0 wants both aspects (1,1); candidate 2 is most relevant,
    // 1 is redundant with 2, 3 covers the other aspect. MMR at λ=.7
    // must select 2, then 3 (1's redundancy penalty sinks it), then 1.
    val v = Map(
      0L -> Array(1.0, 1.0),
      1L -> Array(1.0, 0.0),
      2L -> Array(0.995, 0.1),
      3L -> Array(0.0, 1.0))
    val vecs = v.toSeq.map { case (id, a) => (id, a.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val cand = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("query_id", "vec_id")
    val got = RetrievalOps.mmrRerank(vecs, "vec_id", "embedding", cand, kSel = 3)
      .select("step", "vec_id", "mmr10").as[(Int, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(2L, 3L, 1L))
    // naive greedy with the identical integer arithmetic (float32 cast
    // first, as the engine reads float embeddings)
    def micro(a: Array[Double], b: Array[Double]): Long = {
      val af = a.map(x => x.toFloat.toDouble); val bf = b.map(x => x.toFloat.toDouble)
      val dot = af.zip(bf).map { case (x, y) => math.floor(x * y * 1e12).toLong }.sum
      val na = math.sqrt(af.map(x => math.floor(x * x * 1e12).toLong).sum / 1e12)
      val nb = math.sqrt(bf.map(x => math.floor(x * x * 1e12).toLong).sum / 1e12)
      math.floor(dot / 1e12 / (na * nb) * 1e6).toLong
    }
    val ids = Seq(1L, 2L, 3L)
    var selected = List.empty[Long]
    val expect = (1 to 3).map { step =>
      val rem = ids.filterNot(selected.contains)
      val scored = rem.map { c =>
        val s = if (selected.isEmpty) 7L * micro(v(0L), v(c))
                else 7L * micro(v(0L), v(c)) -
                  3L * selected.map(sv => micro(v(c), v(sv))).max
        (c, s)
      }
      val (bid, bs) = scored.minBy { case (c, s) => (-s, c) }
      selected ::= bid
      (step, bid, bs)
    }
    assert(got.toSeq == expect)
  }

  test("temperature mixing boosts low-resource strata vs raw share") {
    // replicate the td38 arithmetic on a skewed two-lang corpus
    val docs = (1L to 100L).map(i =>
        (i, if (i <= 90) "en" else "de", "w " * 10)) // en 90 docs, de 10
      .toDF("doc_id", "lang", "text")
    val per = docs.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(org.apache.spark.sql.functions.size(
          graft.operators.TextOps.words($"text")).cast("long")).as("n_tokens"))
      .withColumn("s_scaled",
        floor(sqrt($"n_tokens".cast("double")) * lit(1e6)).cast("long"))
    val tot = per.agg(sum($"s_scaled").as("tot_s"), sum($"n_tokens").as("tot_t"))
    val rows = per.crossJoin(tot)
      .select($"lang",
        expr("(n_tokens * 1000000) DIV tot_t").as("raw_micro"),
        expr("(s_scaled * 1000000) DIV tot_s").as("w_micro"))
      .as[(String, Long, Long)].collect().toMap2a
    val (deRaw, deW) = rows("de")
    val (enRaw, enW) = rows("en")
    assert(deW > deRaw, "sqrt temperature must boost the low-resource lang")
    assert(enW < enRaw, "and shrink the high-resource lang")
    // micro weights sum to ~1e6 (integer-division dust only)
    assert(deW + enW <= 1000000L && deW + enW >= 999998L)
  }

  private implicit class Tup3Ops[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2a: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("te25 centroid drift is exactly 1e6 for identical halves and lower for shifted ones") {
    // label 0: even/odd halves carry the SAME two vectors -> identical
    // centroids -> micro-cosine exactly 1e6. label 1: odd half rotated
    // away -> drift strictly below.
    val dir = java.nio.file.Files.createTempDirectory("graft-te25").toString
    val v1 = Array.tabulate(64)(d => (if (d == 0) 1.0f else 0.1f))
    val v2 = Array.tabulate(64)(d => (if (d == 1) 1.0f else 0.2f))
    val rot = Array.tabulate(64)(d => (if (d == 63) 1.0f else -0.1f))
    Seq((0L, v1, 0), (1L, v1, 0), (2L, v2, 0), (3L, v2, 0),
        (10L, v1, 1), (11L, rot, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("te25_centroid_drift")(spark, dir)
      .select("label", "drift_micro").as[(Int, Long)].collect().toMap
    assert(got(0) == 1000000L)
    assert(got(1) < 1000000L)
  }

  test("td39 shard manifest conserves corpus totals and assigns deterministically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-td39").toString
    val docs = (1L to 300L).map(i => (i, s"w$i text of doc $i", "en", "s", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("td39_shard_manifest")(spark, dir)
      .select("shard", "n_docs", "n_tokens").as[(Int, Long, Long)].collect()
    assert(rows.map(_._2).sum == 300L, "every doc lands in exactly one shard")
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall(r => r._1 >= 0 && r._1 < 16))
    // deterministic: a re-run produces the identical manifest
    val again = SparkEntry.queries("td39_shard_manifest")(spark, dir)
      .select("shard", "n_docs", "n_tokens").as[(Int, Long, Long)].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }
}
