package graft

import graft.operators.{RetrievalOps, TextOps}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class PipelineExt3Spec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  test("c4Clean applies the three line rules and the page rule") {
    val tenGood = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      // 3 clean chunks + a 'dup' chunk: page kept, bad chunk removed
      (1L, s"$tenGood $tenGood $tenGood dup " + (1 to 9).map(i => s"x$i").mkString(" ")),
      // stopword-heavy chunk (3 of {a,the}) + short tail: both dropped,
      // only 2 clean chunks survive -> page dropped
      (2L, s"$tenGood $tenGood a the a w x y z p q r tail1 tail2"),
      // short doc: one full clean chunk + tiny tail -> page dropped
      (3L, s"$tenGood v1 v2")
    ).toDF("doc_id", "text")
    val out = TextOps.c4Clean(docs, "doc_id", "text")
      .select("doc_id", "n_chunks", "n_bad", "n_stopheavy", "n_short",
        "n_kept", "keep_doc", "clean_text")
      .as[(Long, Int, Long, Long, Long, Long, Boolean, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4, 1L, 0L, 0L, 3L, true,
      s"$tenGood $tenGood $tenGood")))
    assert(out(2L) == ((2L, 4, 0L, 1L, 1L, 2L, false, s"$tenGood $tenGood")))
    assert(out(3L) == ((3L, 2, 0L, 0L, 1L, 1L, false, tenGood)))
  }

  test("c4Clean rebuilds surviving chunks in document order") {
    val c1 = (1 to 10).map(i => s"a$i").mkString(" ")
    val c2 = (1 to 10).map(i => s"b$i").mkString(" ")
    val c3 = (1 to 10).map(i => s"c$i").mkString(" ")
    val docs = Seq((7L, s"$c1 dup ${(1 to 9).map(i => s"z$i").mkString(" ")} $c2 $c3"))
      .toDF("doc_id", "text")
    val got = TextOps.c4Clean(docs, "doc_id", "text")
      .select("clean_text").as[String].head()
    assert(got == s"$c1 $c2 $c3")
  }

  test("doremiWeights boosts the high-loss domain and conserves mass") {
    // domain "rep" repeats one word (high unique-token deficit = high
    // proxy loss); domain "div" is all-distinct (zero deficit)
    val rep = (1L to 40L).map(i => (i, "w w w w w w w w w w", "rep"))
    val div = (41L to 80L).map(i =>
      (i, (1 to 10).map(j => s"u${i}_$j").mkString(" "), "div"))
    val docs = (rep ++ div).toDF("doc_id", "text", "source")
    val w = TextOps.doremiWeights(docs, "doc_id", "text", "source")
      .select("domain", "loss_micro", "w_micro")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(w("rep")._2 == 900000L) // 1 - 1/10 in micros
    assert(w("div")._2 == 0L)
    assert(w("rep")._3 > 500000L, "high-loss domain must gain weight")
    assert(w("div")._3 < 500000L)
    // mass conserved up to integer-division remainders
    val tot = w.values.map(_._3).sum
    assert(tot >= 999990L && tot <= 1000010L, s"total $tot")
  }

  test("doremiWeights is uniform when losses are equal") {
    val docs = (1L to 60L).map(i =>
      (i, "w w w w w", if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("doc_id", "text", "source")
    val w = TextOps.doremiWeights(docs, "doc_id", "text", "source")
      .select("w_micro").as[Long].collect()
    assert(w.toSet == Set(333333L), s"got ${w.toSeq}") // 1e6 DIV 3 survives every step
  }

  test("bm25Negatives never returns the query's own label (nor itself)") {
    val docs = Seq(
      (0L, "alpha beta gamma delta", "s1"),
      (1L, "alpha beta gamma", "s1"),   // same label: excluded
      (2L, "alpha beta epsilon", "s2"), // best cross-label match
      (3L, "alpha zeta eta", "s2"),
      (4L, "theta iota kappa", "s3")    // no query terms: unscored
    ).toDF("doc_id", "text", "source")
    val out = RetrievalOps.bm25Negatives(docs, "doc_id", "text", "source",
        _ === 0L, nTerms = 4, k = 3)
      .select("query_id", "doc_id", "rk")
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(out.map(_._1).toSet == Set(0L))
    assert(!out.map(_._2).contains(0L), "self must be excluded")
    assert(!out.map(_._2).contains(1L), "same-label doc must be excluded")
    assert(out.map(_._2).toSeq == Seq(2L, 3L), "ranked by shared-term score")
    assert(out.map(_._3).toSeq == Seq(1, 2))
  }

  test("bm25Negatives ranks match bm25TopK's scores under the gate") {
    // the gate must not change scoring: scores of surviving docs equal
    // the ungated bm25TopK scores for the same (query, doc) pairs
    val docs = (1L to 50L).map { i =>
      val words = (0 until 12).map(j => s"t${(i * 7 + j * 3) % 17}").mkString(" ")
      (i, words, s"s${i % 4}")
    }.toDF("doc_id", "text", "source")
    val neg = RetrievalOps.bm25Negatives(docs, "doc_id", "text", "source",
        _ % 10 === 0, nTerms = 5, k = 5)
      .select("query_id", "doc_id", "score")
      .as[(Long, Long, Double)].collect().toSet
    val all = RetrievalOps.bm25TopK(docs, "doc_id", "text",
        _ % 10 === 0, nTerms = 5, k = 1000)
      .select("query_id", "doc_id", "score")
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(neg.nonEmpty)
    neg.foreach { case (q, d, s) =>
      assert(all((q, d)) == s, s"score mismatch for ($q,$d)")
    }
  }
}
