package graft

import graft.operators.{Dedup, TextOps, VectorOps}
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

  test("gopherRules verdicts fire per rule on crafted documents") {
    val docs = Seq(
      // 1: too short (3 words) but otherwise fine tokens
      (1L, "the a data"),
      // 2: 30 words, mean 4.67, 16/30 short, all 7 function words,
      // max length 6 -> passes every rule
      (2L, (Seq("the", "a", "data", "row", "value", "query", "table") ++
        Seq.fill(12)("scan") ++ Seq.fill(11)("column")).mkString(" ")),
      // 3: long words -> fails maxlen and meanlen bands
      (3L, Seq.fill(35)("supercalifragilistic").mkString(" "))
    ).toDF("doc_id", "text")
    val r = TextOps.gopherRules(docs, "doc_id", "text")
      .select("doc_id", "r_wordcount", "r_meanlen", "r_maxlen", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r(1L) == ((false, false, true, false))) // short, mean 2.67 < 4.2
    assert(r(2L) == ((true, true, true, true)))
    assert(r(3L) == ((true, false, false, false)))
  }

  test("connectedComponents labels chains/cycles; clusterKeepers keeps min per cluster") {
    // chain 1-2-3 (via transitivity), cycle 10-11-12-10, singleton 20
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 10L))
      .toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    val docs = (Seq(1L, 2L, 3L, 10L, 11L, 12L, 20L)).toDF("doc_id")
    val keepers = Dedup.clusterKeepers(docs, col("doc_id"), pairs)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(keepers == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (10L, 10L, true), (11L, 10L, false), (12L, 10L, false), (20L, 20L, true)))
  }

  test("sourceNovelty: unique-gram fraction per source, shared grams excluded") {
    // srcA: two docs sharing one 3-gram with srcB; srcB has one doc
    // whose grams are otherwise unseen. Grams are distinct per source.
    val docs = Seq(
      (1L, "a b c d", "srcA"),   // grams: "a b c", "b c d"
      (2L, "a b c", "srcA"),     // gram:  "a b c" (dup within source)
      (3L, "a b c x y", "srcB")  // grams: "a b c", "b c x", "c x y"
    ).toDF("doc_id", "text", "source")
    // srcA distinct grams: {"a b c","b c d"} — "a b c" shared with srcB;
    // srcB: {"a b c","b c x","c x y"} — two grams no other source has
    val bySrc = TextOps.sourceNovelty(docs, "doc_id", "text", "source", 3)
      .select("source", "n_grams", "n_unique", "unique_micro")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(bySrc == Set(("srcA", 2L, 1L, 500000L),
      ("srcB", 3L, 2L, 666666L)))
  }

  test("softDedupWeights: cluster weight sums to ~1e6; singleton keeps 1e6") {
    // 3-doc chain cluster + 2-doc pair + singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val out = Dedup.softDedupWeights(docs, col("doc_id"), pairs)
      .select("id", "rep_id", "cluster_size", "w_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L, 3L, 333333L), (2L, 1L, 3L, 333333L), (3L, 1L, 3L, 333333L),
      (10L, 10L, 2L, 500000L), (11L, 10L, 2L, 500000L),
      (20L, 20L, 1L, 1000000L)))
    // per-cluster totals: exact 1e6 when size divides, floor remainder
    // otherwise (3 x 333333 = 999999) — never above 1e6
    val totals = out.groupBy(_._2).view.mapValues(_.toSeq.map(_._4).sum)
    assert(totals.values.forall(t => t <= 1000000L && t >= 999998L))
  }

  test("priorityKeepers keeps the best (priority, id) doc per cluster") {
    // cluster {1,2,3}: doc 2 has the best priority -> keeper despite
    // not being the min id; singleton 20 keeps itself.
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val docs = Seq((1L, 5), (2L, 1), (3L, 5), (20L, 9)).toDF("doc_id", "prio")
    val out = Dedup.priorityKeepers(docs, col("doc_id"), col("prio"), pairs)
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 == 2L && !out(1L)._4)
    assert(out(2L)._3 == 2L && out(2L)._4)
    assert(out(3L)._3 == 2L && !out(3L)._4)
    assert(out(20L)._3 == 20L && out(20L)._4)
    assert(out(1L)._2 == 1L) // cluster label stays the min id
  }

  test("connectedComponents iterative path (cap=0) equals the small-graph fast path") {
    // Random-ish graph with a long chain (exercises multi-round
    // convergence in the iterative path) plus separate components.
    val chain = (1L until 20L).map(i => (i, i + 1))
    val pairs = (chain ++ Seq((100L, 101L), (200L, 201L), (201L, 202L)))
      .toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val iterative = Dedup.connectedComponents(pairs, smallGraphEdgeCap = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast == iterative)
    assert(fast(20L) == 1L && fast(101L) == 100L && fast(202L) == 200L)
  }

  test("connectedComponents accepts an edge cap above Int.MaxValue (clamped probe)") {
    // A cap > Int.MaxValue used to overflow in .toInt (negative limit);
    // it must clamp and still take the small-graph path correctly.
    val pairs = Seq((2L, 1L), (2L, 3L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs,
        smallGraphEdgeCap = Long.MaxValue)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("componentsWithinGroups equals connectedComponents on group-confined edges") {
    val pairs = Seq((0L, 2L, 1L), (0L, 2L, 3L), (1L, 10L, 11L),
        (1L, 11L, 12L), (1L, 12L, 10L), (2L, 7L, 9L))
      .toDF("g", "id_a", "id_b")
    val grouped = Dedup.componentsWithinGroups(pairs, "g")
      .as[(Long, Long)].collect().toMap
    val global = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(grouped == global)
    assert(grouped == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 7L -> 7L, 9L -> 7L))
  }

  test("piiRedact counts and redacts each PII class independently") {
    val docs = Seq(
      (1L, "reach me at bob.smith@corp.example.org or 555-123-4567 thanks"),
      (2L, "server 192.168.10.25 logged account 123456789 twice: 987654321"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val out = TextOps.piiRedact(docs, "doc_id", "text")
      .as[(Long, Int, Int, Int, Int, String, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1 && out(1L)._3 == 1 && out(1L)._4 == 0 && out(1L)._5 == 0)
    assert(out(2L)._2 == 0 && out(2L)._3 == 0 && out(2L)._4 == 1 && out(2L)._5 == 2)
    assert(out(3L)._2 + out(3L)._3 + out(3L)._4 + out(3L)._5 == 0)
    // redacted length: doc 3 untouched; doc 1 shrinks (email+phone
    // replaced by short tokens)
    assert(out(3L)._7 == "no pii here at all".length)
    assert(out(1L)._7 ==
      "reach me at [EMAIL] or [PHONE] thanks".length)
  }

  test("bigramLmScore computes MLE conditional probabilities exactly") {
    // corpus: "a b" x3, "a c" x1 -> c1(a)=4, c2(a b)=3, c2(a c)=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    val out = TextOps.bigramLmScore(docs, "doc_id", "text", rareMax = 1L,
        flagRatio = 0.5)
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: one bigram "a b": p = 3/4 -> floor(3e6/4)/1e6 = 0.75
    assert(out(1L)._2 == 1L && out(1L)._3 == 0.75)
    assert(!out(1L)._5) // c2=3 > rareMax=1 -> not rare
    // doc 4: "a c": p = 1/4; c2=1 <= rareMax -> rare_ratio 1, flagged
    assert(out(4L)._3 == 0.25 && out(4L)._4 == 1.0 && out(4L)._5)
  }

  test("SRP hyperplane signs are balanced and pairwise-uncorrelated") {
    // Locks in the two-round sign hash: the original one-round version
    // had adjacent hyperplanes agreeing on up to 60/64 dims (or as few
    // as 2/64 — a negated copy), which collapsed the effective bit
    // count and produced thousand-member tail buckets at corpus scale.
    def sign(b: Int, d: Int): Int = {
      val i = (b * 64 + d + 1).toLong
      var h = (i * 2654435761L) & 0xFFFFFFFFL
      h ^= h >> 16
      h = ((h & ((1L << 27) - 1)) * 1597334677L) & 0xFFFFFFFFL
      h ^= h >> 16
      (h & 1L).toInt
    }
    val pats = (0 until 16).map(b => (0 until 64).map(d => sign(b, d)))
    for (p <- pats) {
      val ones = p.sum
      assert(ones >= 20 && ones <= 44, s"unbalanced row: $ones/64")
    }
    for (i <- 0 until 16; j <- (i + 1) until 16) {
      val agree = pats(i).lazyZip(pats(j)).count { case (a, b) => a == b }
      assert(agree >= 16 && agree <= 48,
        s"correlated hyperplanes $i,$j: agree $agree/64")
    }
    // and the engine expression agrees with this reference formula:
    // a vector with a single positive component d sets bit b iff
    // sign(b,d)=1 (floor(±x*1e12) keeps the sign for x=1).
    val vecs = Seq((0L, Array.tabulate(64)(d => if (d == 7) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val bucket = vecs.select(graft.operators.VectorOps.srpBucket(
        graft.operators.VectorOps.toDouble(col("embedding")), 16).as("b"))
      .as[Long].collect()(0)
    val expected = (0 until 16).map(b => sign(b, 7).toLong << b).sum
    assert(bucket == expected)
  }

  test("srpBucket rejects embedding dim > 64 loudly (fixed sign-hash stride)") {
    // The (bit,dim) sign hash strides by 64; dim > 64 would alias
    // adjacent hyperplanes' components (silent bucket-quality decay),
    // so it must throw instead.
    val vecs = Seq((0L, Array.fill(65)(1.0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      vecs.select(graft.operators.VectorOps.srpBucket(
          graft.operators.VectorOps.toDouble(col("embedding")), 8).as("b"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("dim <= 64")))
  }

  test("exactSubstrRemove keeps first occurrence, strips covered tokens elsewhere") {
    // Docs 1 and 2 share the 4-gram "a b c d" (doc 1 first); doc 3 is
    // clean. Doc 2 loses exactly the 4 covered tokens, keeps its tail.
    val docs = Seq(
      (1L, "a b c d x y"),
      (2L, "a b c d tail words here"),
      (3L, "nothing shared at all"))
      .toDF("doc_id", "text")
    val out = TextOps.exactSubstrRemove(docs, "doc_id", "text", n = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((6L, 0L, "a b c d x y")))
    assert(out(2L) == ((7L, 4L, "tail words here")))
    assert(out(3L) == ((4L, 0L, "nothing shared at all")))
  }

  test("exactSubstrRemove drops overlapping duplicate spans as a union of covers") {
    // One doc repeats a span INTERNALLY: windows overlap; the second
    // occurrence's covered positions are removed, first kept.
    val docs = Seq(
      (1L, "p q r s p q r s"), // "p q r s" twice, 4-gram dup at q=0 and q=4
      (2L, "unrelated filler text only"))
      .toDF("doc_id", "text")
    val out = TextOps.exactSubstrRemove(docs, "doc_id", "text", n = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L)._2 == 4L)          // 4 tokens removed
    assert(out(1L)._3 == "p q r s")   // first occurrence survives
  }

  test("linearProbe learns to rank the labeled class above the mean") {
    // long docs labeled 1, short docs labeled 0: the word-count
    // feature separates them, so after 5 GD rounds every positive doc
    // must score above every negative one and land 'selected'.
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    val docs = (1L to 4L).map(i => (i, long.trim, 1.0)) ++
      (5L to 8L).map(i => (i, "tiny doc", 0.0))
    val out = TextOps.linearProbe(docs.toDF("doc_id", "text", "y0"),
        "doc_id", "text", col("y0"))
      .as[(Long, Double, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    val posMin = (1L to 4L).map(out(_)._3).min
    val negMax = (5L to 8L).map(out(_)._3).max
    assert(posMin > negMax)
    assert((1L to 4L).forall(out(_)._4) && (5L to 8L).forall(!out(_)._4))
  }

  test("knnGraph matches brute-force top-k when every vector shares a bucket") {
    // nbits=0 -> single bucket: candidates are ALL pairs, so the graph
    // must equal exact brute-force top-k; mutual flags follow.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.9f, 0.2f))).toDF("vec_id", "embedding")
    val g = VectorOps.knnGraph(vecs, "vec_id", "embedding", nbits = 0, k = 1)
      .as[(Long, Long, Double, Int, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(g(1L)._2 == 2L && g(2L)._2 == 1L && g(1L)._5 && g(2L)._5)
    assert(g(3L)._2 == 4L && g(4L)._2 == 3L && g(3L)._5 && g(4L)._5)
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

  test("evalContamination flags train vectors near any eval vector") {
    // id 0 is the eval split (0 % 20 == 0). Train: id 1 parallel
    // (cos 1.0), id 2 orthogonal (cos 0), id 3 at exactly 4/5 = 0.8
    // (integer components keep the scaled-long arithmetic exact).
    val vecs = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(2f, 0f)),
      (2L, Seq(0f, 1f)), (3L, Seq(4f, 3f))
    ).toDF("vec_id", "embedding")
    val out = VectorOps.evalContamination(vecs, "vec_id", "embedding", 20, 0.5)
      .orderBy("train_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 1L, 1.0), (3L, 1L, 0.8)))
  }

  test("ivfEvalContamination probing ALL cells equals the exact scan") {
    val rnd = new scala.util.Random(23)
    val df = (0L until 60L).map(i =>
        (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val exact = VectorOps.evalContamination(
        df, "vec_id", "embedding", 20, 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val ivf = VectorOps.ivfEvalContamination(
        df, "vec_id", "embedding", 20, 0.3, nlist = 4, nprobe = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty && ivf == exact)
  }

  test("ivfEvalContamination with nprobe < nlist is a conservative subset of exact") {
    // IVF candidates are a subset of all pairs, so every flagged doc
    // must also be exact-flagged, with hit count and best score never
    // exceeding the exact ones — the recall trade only DROPS pairs.
    val rnd = new scala.util.Random(31)
    val df = (0L until 80L).map(i =>
        (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val exact = VectorOps.evalContamination(
        df, "vec_id", "embedding", 20, 0.2)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val ivf = VectorOps.ivfEvalContamination(
        df, "vec_id", "embedding", 20, 0.2, nlist = 8, nprobe = 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(ivf.nonEmpty)
    ivf.foreach { case (id, hits, cos) =>
      val (eh, ec) = exact.getOrElse(id, fail(s"doc $id not exact-flagged"))
      assert(hits <= eh && cos <= ec, s"doc $id: ivf ($hits,$cos) vs exact ($eh,$ec)")
    }
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

  test("decontaminate flags full-overlap docs and clears disjoint ones") {
    val bench = Seq((100L, "a b c d e f g")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c d e f g"),               // identical to the benchmark
      (2L, "q r s t u v w x y z"),         // disjoint
      (3L, "a b c d e nothing shared xx")) // 1 of 4 grams overlaps
      .toDF("doc_id", "text")
    val r = TextOps.decontaminate(
        TextOps.shingleHashIndex(corpus, "doc_id", "text", 5),
        TextOps.shingleHashIndex(bench, "doc_id", "text", 5), 0.2)
      .select("id", "n_grams", "n_hits", "overlap", "contaminated")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r(1L) == ((3L, 3L, 1.0, true)))
    assert(r(2L) == ((6L, 0L, 0.0, false)))
    assert(r(3L) == ((4L, 1L, 0.25, true)))
  }

  test("decontaminateBloom matches exact decontaminate; empty benchmark clears all") {
    val bench = Seq((100L, "a b c d e f g")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c d e f g"),
      (2L, "q r s t u v w x y z"),
      (3L, "a b c d e nothing shared xx"))
      .toDF("doc_id", "text")
    val cIdx = TextOps.shingleHashIndex(corpus, "doc_id", "text", 5)
    val bIdx = TextOps.shingleHashIndex(bench, "doc_id", "text", 5)
    val exact = TextOps.decontaminate(cIdx, bIdx, 0.2)
      .orderBy("id").collect().toSeq
    val bloom = TextOps.decontaminateBloom(cIdx, bIdx, 0.2)
      .orderBy("id").collect().toSeq
    assert(bloom == exact)
    val none = TextOps.decontaminateBloom(
        cIdx, bIdx.where(lit(false)), 0.2)
      .select("id", "n_hits", "contaminated")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(none == Set((1L, 0L, false), (2L, 0L, false), (3L, 0L, false)))
  }

  test("corpusRelFreq averages relative corpus frequencies exactly") {
    // corpus tokens: a,a,a,a,b -> n=5, freq(a)=4, freq(b)=1
    val docs = Seq((1L, "a a a"), (2L, "a b")).toDF("doc_id", "text")
    val idx = docs.select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
    val r = TextOps.corpusRelFreq(idx, "doc_id")
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == ((3L, 0.8)))         // avg(0.8, 0.8, 0.8)
    assert(r(2L) == ((2L, 0.5)))         // avg(0.8, 0.2)
  }

  test("packSequences fills bins greedily, isolates oversize docs, resets per group") {
    val docs = Seq(
      ("en", 1L, 300L), ("en", 2L, 200L), // bin 0 (500 <= 512)
      ("en", 3L, 100L),                   // bin 1 (would be 600)
      ("en", 4L, 900L),                   // bin 2 alone (oversize)
      ("en", 5L, 10L),                    // bin 3 (900+10 > 512)
      ("de", 6L, 512L), ("de", 7L, 1L))   // de bins 0, 1 — fresh numbering
      .toDF("lang", "doc_id", "tokens")
    val got = TextOps.packSequences(docs, "lang", "doc_id", "tokens", 512L)
      .select("id", "bin_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 3L,
      6L -> 0L, 7L -> 1L))
  }

  test("PQ ADC score is exact for vectors lying on centroid codes") {
    // 4-dim vectors, subDim=2, nCent=2: ids 0,1 are the centroids.
    // id 2 copies centroid 0's first subvector and centroid 1's second,
    // so its codes select exactly those — ADC score against any query
    // equals the true dot product.
    val df = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.5f, 0.5f, 0.5f, 0.5f))) // the query (id % 3 == 0 picks 0,3)
      .toDF("vec_id", "embedding")
    val r = VectorOps.pqTopK(df, "vec_id", "embedding", _ === 3L,
        subDim = 2, nCent = 2, k = 4)
      .select("query_id", "vec_id", "score")
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // true dots of q=[.5 .5 .5 .5]: vs v2=[1 0 1 0] -> 1.0
    assert(r((3L, 2L)) == 1.0)
    // v0 and v1 are centroids; their codes are themselves -> exact dots
    assert(r((3L, 0L)) == 1.0 && r((3L, 1L)) == 1.0)
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

  test("IVF+PQ probing ALL cells with a corpus-sized shortlist equals brute force") {
    // nprobe = nlist means no IVF pruning; shortlist >= corpus means
    // ADC drops nothing before the exact re-rank — so the composition
    // must degrade gracefully to the exact answer.
    val rnd = new scala.util.Random(11)
    val df = (0L until 40L).map(i =>
        (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val ivfpq = VectorOps.ivfPqTopK(df, "vec_id", "embedding",
        _ % 10 === 0, nlist = 4, nprobe = 4, subDim = 4, nCent = 8,
        shortlist = 40, k = 3)
      .select("query_id", "vec_id", "cos", "rk")
      .as[(Long, Long, Double, Int)].collect().toSet
    val brute = VectorOps.bruteForceTopK(
        df.filter(col("vec_id") % 10 === 0), df, "vec_id", "embedding", 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(ivfpq == brute)
  }

  test("lineDedup keeps duplicated chunks only in the lowest-id doc, tail intact") {
    val docs = Seq(
      (1L, "a b c d e f g h"), // chunks [a b c][d e f], tail "g h"
      (2L, "a b c x y z"),     // loses [a b c] to doc 1, keeps [x y z]
      (3L, "x y z q"))         // loses [x y z] to doc 2, tail "q"
      .toDF("doc_id", "text")
    val out = TextOps.lineDedup(docs, "doc_id", "text", chunkWords = 3)
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2, 0, "a b c d e f g h")))
    assert(out(2L) == ((2, 1, "x y z")))
    assert(out(3L) == ((1, 1, "q")))
  }

  test("dupSpanStats counts windows shared across docs") {
    val docs = Seq(
      (1L, "a b c d e"), // grams: abc bcd cde — abc, bcd shared with doc 2
      (2L, "a b c d x"),
      (3L, "p q r s t"))
      .toDF("doc_id", "text")
    val out = TextOps.dupSpanStats(docs, "doc_id", "text",
        n = 3, minDf = 2, flagFrac = 0.5)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((3L, 2L, 0.666667, true)))
    assert(out(2L) == ((3L, 2L, 0.666667, true)))
    assert(out(3L) == ((3L, 0L, 0.0, false)))
  }

  test("importanceSelect scores target-likeness as ratio of smoothed count sums") {
    val corpus = Seq((1L, "x"), (1L, "y"), (2L, "z"), (2L, "z")).toDF("id", "w")
    val target = Seq((9L, "x"), (9L, "x"), (9L, "y")).toDF("id", "w")
    val out = TextOps.importanceSelect(corpus, target, quota = 1)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: num = (2+1)+(1+1) = 5, den = (1+1)+(1+1) = 4 → 1.25, selected
    // doc 2: num = (0+1)*2 = 2, den = (2+1)*2 = 6 → 0.333333
    assert(out(1L) == ((2L, 1.25, true)))
    assert(out(2L) == ((2L, 0.333333, false)))
  }

  test("semanticDedup groups within-cluster near-dups, keeps min id") {
    val docs = Seq(
      (0L, Seq(1.0f, 0.0f)),   // centroid / cell 0
      (1L, Seq(0.0f, 1.0f)),   // centroid / cell 1
      (2L, Seq(0.9f, 0.1f)),   // cell 0; cos(2,3) ≈ 0.9998
      (3L, Seq(0.92f, 0.08f)), // cell 0; cos(0,3) ≈ 0.9961
      (4L, Seq(0.1f, 0.9f)))   // cell 1; cos(1,4) ≈ 0.9938 < 0.995
      .toDF("vec_id", "embedding")
    val out = VectorOps.semanticDedup(docs, "vec_id", "embedding",
        nlist = 2, threshold = 0.995)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      0L -> ((0L, 0L, true)), 1L -> ((1L, 1L, true)),
      2L -> ((0L, 0L, false)), 3L -> ((0L, 0L, false)),
      4L -> ((1L, 4L, true))))
  }

  test("semanticDedup hierarchical split caps leaf cells, preserves dup groups") {
    // 60 spread-out vectors land in one coarse cell (nlist=1); with
    // cellCap=16 the cell must split recursively until every leaf is
    // ≤ 16, and near-identical neighbors must still dedup together.
    val docs = (0L until 60L).map { i =>
      // quarter-circle fan; every 10th sits 1e-4 rad from its
      // predecessor's angle (a near-copy), the rest 0.026 rad apart
      val a =
        if (i % 10 == 9) (i - 1).toDouble / 60.0 * math.Pi / 2 + 0.0001
        else i.toDouble / 60.0 * math.Pi / 2
      (i, Seq(math.cos(a).toFloat, math.sin(a).toFloat))
    }.toDF("vec_id", "embedding")
    val out = VectorOps.semanticDedup(docs, "vec_id", "embedding",
        nlist = 1, threshold = 0.9999, cellCap = 16, fanout = 4)
      .as[(Long, Long, Long, Boolean)].collect()
    val cellSizes = out.groupBy(_._2).view.mapValues(_.length)
    assert(cellSizes.values.max <= 16, s"oversized leaf: $cellSizes")
    assert(cellSizes.size > 1) // it actually split
    // Sub-cells are refinements of the single coarse cell, so a pair
    // this close (cos ≈ 1) stays co-located and dedups: every doc is
    // its own rep except near-copies that share a leaf with their twin.
    val reps = out.map(r => r._1 -> r._3).toMap
    val copied = (0L until 60L).filter(i => i % 10 == 9 && reps(i) == i - 1)
    assert(copied.nonEmpty, "no near-copy deduped against its twin")
    // And under the cap nothing changes: same data, cap above n ==
    // bit-identical to the unsplit single-level quantizer.
    val unsplit = VectorOps.semanticDedup(docs, "vec_id", "embedding",
        nlist = 1, threshold = 0.9999, cellCap = 4096)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(unsplit.map(_._2).distinct.sameElements(Array(0L)))
  }

  test("winnowing guarantees a shared fingerprint for any >= w+k-1-word match") {
    // k=4, w=4: any shared run of >= 7 words must yield a shared
    // fingerprint (the MOSS guarantee). Docs 1/2 share exactly a 7-word
    // run embedded in different contexts; doc 3 shares nothing.
    val shared = "qq ww ee rr tt yy uu"
    val docs = Seq(
      (1L, s"aa bb cc $shared dd ff gg hh jj kk ll"),
      (2L, s"zz xx $shared vv nn mm oo pp aa2 bb2 cc2"),
      (3L, "one two three four five six seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(docs, "doc_id", "text", 4, 4)
    val byDoc = fps.as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "guaranteed fingerprint missed")
    assert((byDoc(1L) & byDoc(3L)).isEmpty && (byDoc(2L) & byDoc(3L)).isEmpty)
    // Density: winnowing selects far fewer fingerprints than grams.
    val nGrams1 = docs.where(col("doc_id") === 1L)
      .select(size(TextOps.words(col("text")))).as[Int].head() - 3
    assert(byDoc(1L).size < nGrams1)
    // And the pair miner surfaces (1,2) when the threshold admits it.
    val pairs = TextOps.winnowPairs(fps, minShared = 1, bucketCap = 50)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L))
  }

  test("winnowPairs drops fingerprints above the boilerplate cap") {
    // 5 docs all carrying the same 7-word boilerplate run: with
    // bucketCap >= 5 every pair surfaces; with bucketCap 4 the
    // boilerplate fingerprints die and no pair survives.
    val run = "the same legal footer appears every single time"
    val docs = (1L to 5L).map(i => (i, s"doc$i unique$i words$i $run tail$i"))
      .toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(docs, "doc_id", "text", 4, 4)
    val open = TextOps.winnowPairs(fps, minShared = 1, bucketCap = 50).count()
    val capped = TextOps.winnowPairs(fps, minShared = 1, bucketCap = 4).count()
    assert(open == 10L, s"expected all C(5,2) pairs, got $open")
    assert(capped == 0L, s"expected boilerplate suppressed, got $capped")
  }

  test("b-bit minhash: identical shingle sets match all perms, disjoint sets estimate ~0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // identical
      (3L, "one two three four five six seven eight nine")   // disjoint
    ).toDF("doc_id", "text")
    val idx = docs.select(col("doc_id").as("id"),
      explode(TextOps.wordNgrams(TextOps.words(col("text")), 3)).as("gr"))
    val sig = TextOps.bbitMinhashSig(idx, 16, 8)
    val rows = sig.collect().map(r => r.getLong(0) ->
      (1 to 16).map(i => r.getLong(i))).toMap
    assert(rows(1L) == rows(2L), "identical sets must share every b-bit entry")
    assert(rows.values.forall(_.forall(v => v >= 0 && v < 256)))
    val m13 = rows(1L).zip(rows(3L)).count { case (a, b) => a == b }
    // C(16, 1/256): P[>=4 collisions] < 1e-6 — disjoint stays near 0.
    assert(m13 <= 3, s"disjoint sets matched $m13/16 b-bit entries")
  }

  test("lshBandTuning: exact S-curve columns, loosest config catches the union") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "one two three four five six seven"),
      (4L, "one two three four five six eight"),   // J = 4/6 < 0.8
      (5L, "totally different words entirely here now")
    ).toDF("doc_id", "text")
    val idx = TextOps.shingleIndex(docs, "doc_id", "text", 3)
    val rows = TextOps.lshBandTuning(idx).orderBy("rows_per_band").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(1)).toSeq == Seq(2L, 3L, 4L, 6L, 12L))
    rows.foreach { r =>
      assert(r.getLong(0) == 12L / r.getLong(1)) // bands = P / r
      // the identical pair (1,2) matches every band of every config
      assert(r.getLong(3) >= 1L, s"n_true at r=${r.getLong(1)}")
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3)) // n_false
    }
    val byR = rows.map(r => r.getLong(1) -> r).toMap
    // containment: the union IS r=2's candidate set, so its caught
    // share is exactly 1e6; r=12's candidates are a subset of every
    // other config's (an aligned 12-block contains every divisor block)
    assert(byR(2L).getLong(5) == 1000000L)
    assert(rows.map(_.getLong(2)).forall(_ <= byR(2L).getLong(2)))
    assert(rows.map(_.getLong(2)).forall(_ >= byR(12L).getLong(2)))
    // S-curve columns replay the closed integer form
    def micro(d: BigInt, n: BigInt, r: Int): Long =
      (((d.pow(12) - (d.pow(r) - n.pow(r)).pow(12 / r)) * 1000000)
        / d.pow(12)).toLong
    rows.foreach { row =>
      val r = row.getLong(1).toInt
      assert(row.getLong(6) == micro(5, 4, r), s"p80 at r=$r")
      assert(row.getLong(7) == micro(2, 1, r), s"p50 at r=$r")
    }
    // spot values: r=2 -> 1-(1-0.64)^6, r=12 -> 0.8^12
    assert(byR(2L).getLong(6) == 997823L)
    assert(byR(12L).getLong(6) == 68719L)
  }

  test("lshBandTuning refuses non-divisor and containment-breaking grids") {
    val idx = Seq((1L, "a b c d")).toDF("doc_id", "text")
      .select(col("doc_id").as("id"),
        explode(TextOps.wordNgrams(TextOps.words(col("text")), 3)).as("sh"))
    intercept[IllegalArgumentException] {
      TextOps.lshBandTuning(idx, 12, Seq(1, 2)) // r=1: quadratic buckets
    }
    intercept[IllegalArgumentException] {
      TextOps.lshBandTuning(idx, 12, Seq(5)) // 5 does not divide 12
    }
    intercept[IllegalArgumentException] {
      TextOps.lshBandTuning(idx, 17) // S-curve out of exact range
    }
  }

  test("probeCalibration: cumulative confusion sweep is self-consistent") {
    val docs = Seq(
      (1L, "en", "the cat sat on the mat and the dog ran around"),
      (2L, "en", "a quick brown fox jumps over the lazy dog today"),
      (3L, "en", "the sun rose over the hills and the day began"),
      (4L, "de", "der hund lief schnell durch den park am morgen"),
      (5L, "de", "die katze schlief den ganzen tag auf dem sofa"),
      (6L, "de", "ein kurzer satz ohne viele verschiedene woerter hier")
    ).toDF("doc_id", "lang", "text")
    val rows = TextOps.probeCalibration(docs, "doc_id", "text",
        col("lang") === "en")
      .orderBy("thr_bucket").collect()
    assert(rows.nonEmpty)
    // per-bucket counts sum to the corpus; positives to the labels
    assert(rows.map(_.getLong(1)).sum == 6L)
    assert(rows.map(_.getLong(2)).sum == 3L)
    // the lowest threshold keeps everything: full recall, base-rate
    // precision; the cumulative columns of the top row equal its own
    val lo = rows.head
    assert(lo.getLong(3) == 6L && lo.getLong(4) == 3L)
    assert(lo.getLong(8) == 1000000L)              // recall_micro
    assert(lo.getLong(7) == 500000L)               // precision_micro
    val hi = rows.last
    assert(hi.getLong(3) == hi.getLong(1) && hi.getLong(4) == hi.getLong(2))
    rows.foreach { r =>
      assert(r.getLong(5) == r.getLong(3) - r.getLong(4)) // fp
      assert(r.getLong(6) == 3L - r.getLong(4))           // fn
    }
    // lowering the threshold only adds predictions/true positives
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(3) > b.getLong(3) && a.getLong(4) >= b.getLong(4))
      case _ =>
    }
    intercept[IllegalArgumentException] {
      TextOps.probeCalibration(docs, "doc_id", "text",
        col("lang") === "en", bucketMicros = 0)
    }
  }

  test("prototypePrune: per-cluster quota, most-prototypical ranks first") {
    // ids 0/1 seed two orthogonal clusters; 2..6 jitter around e1,
    // 7..8 around e2 — cluster sizes 6 and 3, cap 3.
    def v(a: Double, b: Double, c: Double, d: Double) = Seq(a, b, c, d)
    val vecs = Seq(
      (0L, v(1, 0, 0, 0)), (1L, v(0, 1, 0, 0)),
      (2L, v(1, 0.1, 0, 0)), (3L, v(1, 0.2, 0, 0)), (4L, v(1, 0.3, 0, 0)),
      (5L, v(1, 0.4, 0, 0)), (6L, v(1, 0.5, 0, 0)),
      (7L, v(0.1, 1, 0, 0)), (8L, v(0.2, 1, 0, 0))
    ).toDF("vec_id", "embedding")
    val out = VectorOps.prototypePrune(vecs, "vec_id", "embedding",
        nlist = 2, lloydIters = 1, cap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out.length == 9)
    val byCell = out.groupBy(_._2)
    assert(byCell.keySet == Set(0L, 1L))
    assert(byCell(0L).map(_._1).toSet == Set(0L, 2L, 3L, 4L, 5L, 6L))
    assert(byCell(1L).map(_._1).toSet == Set(1L, 7L, 8L))
    byCell.foreach { case (_, rows) =>
      // quota: min(|cell|, cap) kept, exactly the crk <= cap rows
      assert(rows.count(_._5) == math.min(rows.length, 3))
      rows.foreach(r => assert(r._5 == (r._4 <= 3L)))
      // prototypicality: cos non-increasing along the rank
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1 to rows.length).map(_.toLong))
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3)
        case _ =>
      }
    }
    intercept[IllegalArgumentException] {
      VectorOps.prototypePrune(vecs, "vec_id", "embedding", 2, 1, cap = 0)
    }
  }

  test("staleIndexGate ranks occupancy shift; partialReindex splits only flagged cells") {
    def v(a: Double, b: Double, c: Double, d: Double) = Seq(a, b, c, d)
    // cluster A = {0,2,3,4,5,6}, cluster B = {1,7,8}; churning out
    // id % 3 == 0 retires {0,3,6} — all from A, so B's live share
    // jumps from 1/3 to 1/2 (shift 166667) vs A's drop (166666)
    val vecs = Seq(
      (0L, v(1, 0, 0, 0)), (1L, v(0, 1, 0, 0)),
      (2L, v(1, 0.1, 0, 0)), (3L, v(1, 0.2, 0, 0)), (4L, v(1, 0.3, 0, 0)),
      (5L, v(1, 0.4, 0, 0)), (6L, v(1, 0.5, 0, 0)),
      (7L, v(0.1, 1, 0, 0)), (8L, v(0.2, 1, 0, 0))
    ).toDF("vec_id", "embedding")
    val store = java.nio.file.Files.createTempDirectory("graft-te36spec")
      .toString
    val gate = VectorOps.staleIndexGate(vecs, "vec_id", "embedding",
        s"$store/g", _ % 3 =!= 0, nlist = 2, lloydIters = 1, topK = 1)
      .orderBy("cell").collect()
    assert(gate.length == 2)
    val a = gate(0); val b = gate(1) // cells 0 (A) and 1 (B)
    assert(a.getLong(1) == 6L && a.getLong(2) == 3L) // n_fit, n_live
    assert(b.getLong(1) == 3L && b.getLong(2) == 3L)
    assert(a.getLong(5) == 166666L && b.getLong(5) == 166667L) // shift
    assert(!a.getBoolean(7) && b.getBoolean(7)) // only B flagged at topK=1
    val re = VectorOps.partialReindex(vecs, "vec_id", "embedding",
        s"$store/r", _ % 3 =!= 0, nlist = 2, lloydIters = 1, topK = 1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2))) // (id, sub_seed)
    // only B's live members {1,7,8}; seeds {1,7}; 8 is nearer 7
    assert(re.toSeq == Seq((1L, 1L), (7L, 7L), (8L, 7L)))
    // plan pin: the gate frame reads ONLY the persisted assignment
    // store — the corpus (a LocalTableScan here) must not appear; the
    // reindex decision costs store-sized reads at any corpus size
    val gatePlan = VectorOps.staleIndexGate(vecs, "vec_id", "embedding",
        s"$store/g", _ % 3 =!= 0, nlist = 2, lloydIters = 1, topK = 1)
      .queryExecution.executedPlan.toString
    assert(!gatePlan.contains("LocalTableScan"),
      s"gate plan rescans the corpus:\n$gatePlan")
    assert(gatePlan.contains("graft-te36spec"),
      "gate plan should scan the persisted store")
  }

  test("ivfNlistTuning audits cell balance per candidate geometry") {
    def v(a: Double, b: Double, c: Double, d: Double) = Seq(a, b, c, d)
    val vecs = Seq(
      (0L, v(1, 0, 0, 0)), (1L, v(0, 1, 0, 0)),
      (2L, v(1, 0.1, 0, 0)), (3L, v(1, 0.2, 0, 0)), (4L, v(1, 0.3, 0, 0)),
      (5L, v(1, 0.4, 0, 0)), (6L, v(1, 0.5, 0, 0)),
      (7L, v(0.1, 1, 0, 0)), (8L, v(0.2, 1, 0, 0))
    ).toDF("vec_id", "embedding")
    val rows = VectorOps.ivfNlistTuning(vecs, "vec_id", "embedding",
        Seq(2, 4), lloydIters = 1)
      .orderBy("nlist").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 4L))
    rows.foreach { r =>
      assert(r.getLong(2) == 9L)                      // n_total
      assert(r.getLong(1) <= r.getLong(0))            // cells <= nlist
      assert(r.getLong(4) <= 1000000L && r.getLong(4) >= 1L) // balance
      assert(r.getLong(5) <= 1000000L)                // top2 share
    }
    // nlist=2 on the 6/3 split: balance = 9e6 DIV (2*6), top2 = all
    val n2 = rows.head
    assert(n2.getLong(1) == 2L && n2.getLong(3) == 6L)
    assert(n2.getLong(4) == 750000L && n2.getLong(5) == 1000000L)
    intercept[IllegalArgumentException] {
      VectorOps.ivfNlistTuning(vecs, "vec_id", "embedding", Seq(1), 1)
    }
  }

  test("ivfFilteredTopK pre-filters: a closer cross-attribute vector never surfaces") {
    // Vectors on a 2-D-ish layout inside 64 dims: queries are id%25==0.
    // id 0's nearest overall neighbour (id 1) carries the OTHER label;
    // pre-filtering must pick the farther same-label id 2 instead of
    // returning the near mismatch or an empty result.
    def vec(x: Double, y: Double): Seq[Float] =
      (Seq(x, y) ++ Seq.fill(62)(0.0)).map(_.toFloat)
    val rows = Seq(
      (0L, vec(1.0, 0.0), 0),   // query, label 0 (also centroid 0)
      (1L, vec(0.99, 0.14), 1), // nearest, wrong label
      (2L, vec(0.9, 0.44), 0),  // farther, right label
      (3L, vec(-1.0, 0.1), 1),  // far, wrong label (also ~centroid space)
      (25L, vec(0.0, 1.0), 1),  // second query, label 1
      (26L, vec(0.1, 0.99), 1)) // its same-label neighbour
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = VectorOps.ivfFilteredTopK(df, "vec_id", "embedding", "label",
        _ % 25 === 0, nlist = 2, nprobe = 2, k = 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    assert(out(0L) == 2L, s"query 0 matched ${out(0L)}, want same-label 2")
    assert(out(25L) == 26L)
  }
}
