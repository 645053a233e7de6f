package graft

import graft.operators.CurationOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, regexp_replace}
import org.scalatest.funsuite.AnyFunSuite

class CurationOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  /** gate value of curationManifest's md5 sampler, replicated on the
    * JVM so the test's expectation is independent of the Spark code.
    */
  private def gateMicro(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000000L
  }

  test("greedyAcquisition re-ranks after each pick (not static order)") {
    // srcA and srcB carry IDENTICAL text (5 shared 3-grams each);
    // srcC has 3 grams of its own. Static totals order: A/B tie (5),
    // then C (3) — greedy instead picks A (tie to the smaller name),
    // then C (B's marginal collapsed to 0), then B with marginal 0.
    val shared = "p1 p2 p3 p4 p5 p6 p7"
    val docs = Seq(
      (1L, shared, "srcA"),
      (2L, shared, "srcB"),
      (3L, "c1 c2 c3 c4 c5", "srcC")
    ).toDF("doc_id", "text", "source")
    val out = CurationOps.greedyAcquisition(docs, "doc_id", "text",
        "source", 3, steps = 5)
      .as[(Int, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1, "srcA", 5L, 5L),
      (2, "srcC", 3L, 8L),
      (3, "srcB", 0L, 8L)))
  }

  test("greedyAcquisition caps at `steps` picks") {
    val docs = Seq(
      (1L, "a1 a2 a3 a4 a5", "s1"),
      (2L, "b1 b2 b3 b4", "s2"),
      (3L, "c1 c2 c3", "s3")
    ).toDF("doc_id", "text", "source")
    val out = CurationOps.greedyAcquisition(docs, "doc_id", "text",
        "source", 3, steps = 2)
      .as[(Int, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "s1", 3L, 3L), (2, "s2", 2L, 5L)))
  }

  test("contextWindows: docs cross chunk boundaries, fills are exact") {
    // token counts 600 / 100 / 400 / 512 across whatever shards the
    // ids hash to; expectation computed by an independent tiny model
    // of the concat-then-chunk semantics
    val counts = Map(1L -> 600, 2L -> 100, 3L -> 400, 4L -> 512)
    val docs = counts.toSeq.map { case (id, n) =>
      (id, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = CurationOps.contextWindows(docs, "doc_id", "text", 512L, 16)
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6, r._7)).toMap
    // independent model: per shard, ids ascending, running offset
    val shardOf = (id: Long) => (id * 2654435761L % 1000000007L % 16L).toInt
    val expected = scala.collection.mutable.Map
      .empty[(Int, Long), (Long, Long, Long, Long, Long)]
    counts.keys.toSeq.sorted.groupBy(shardOf).foreach { case (sh, ids) =>
      var off = 0L
      ids.foreach { id =>
        val nt = counts(id).toLong
        for (ch <- off / 512 to (off + nt - 1) / 512) {
          val tok = math.min((ch + 1) * 512, off + nt) - math.max(ch * 512, off)
          val starts = if (off >= ch * 512) 1L else 0L
          val prev = expected.getOrElse((sh, ch), (0L, 0L, Long.MaxValue, 0L, 0L))
          expected((sh, ch)) = (prev._1 + 1, prev._2 + starts,
            math.min(prev._3, id), math.max(prev._4, id), prev._5 + tok)
        }
        off += nt
      }
    }
    assert(out == expected.toMap)
    // the 600-token doc must span two chunks of its shard
    val sh1 = shardOf(1L)
    assert(out.keys.count { case (s, _) => s == sh1 } >= 2 ||
      counts.keys.exists(id => id != 1L && shardOf(id) == sh1))
  }

  test("noveltyCurve: novel fraction decays along the stream") {
    val docs = Seq(
      (0L, "a b c d"),   // grams abc, bcd — both first
      (5L, "a b c x"),   // abc repeated, bcx novel
      (9L, "a b c d")    // both repeated
    ).toDF("doc_id", "text")
    val out = CurationOps.noveltyCurve(docs, "doc_id", "text", 3, 10)
      .as[(Int, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(0) == (0, 2L, 2L, 1000000L))
    assert(out(5) == (5, 2L, 1L, 500000L))
    assert(out(9) == (9, 2L, 0L, 0L))
    assert(out.size == 3)
  }

  test("curationManifest: rules gate, cluster weights sample, manifest sums") {
    // ≥30-word English texts with few a/the per 10-word chunk pass the
    // lenient verdict; ids 1 and 2 are near-dups (one trailing word
    // dropped — shingle Jaccard 29/30 ≥ 0.8, but texts differ so the
    // exact-dup rule keeps both); 3 is a clean singleton; 4 fails the
    // C4 page rule (too short); 5 fails langid agreement (metadata de,
    // stopword vote en).
    val base = (1 to 31).map(i => s"w$i").mkString(" ") // 31 words, 29/30 grams
    val okText = base + " tail"
    val docs = Seq(
      (1L, okText, "en"),
      (2L, base, "en"),
      (3L, (1 to 30).map(i => s"v$i").mkString(" "), "en"),
      (4L, "too short", "en"),
      (5L, (1 to 30).map(i => s"x$i").mkString(" "), "de")
    ).toDF("doc_id", "text", "lang")
    val out = CurationOps.curationManifest(docs, "doc_id", "text", "lang")
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // expected sample: 3 always (w=1e6); 1 and 2 iff gate < 500000
    val expectIds = Seq(1L, 2L).filter(gateMicro(_) < 500000L) :+ 3L
    val shardOf = (id: Long) => (id * 2654435761L % 1000000007L % 16L).toInt
    val nTokens = Map(1L -> 32L, 2L -> 31L, 3L -> 30L)
    val expected = expectIds.groupBy(shardOf).map { case (sh, ids) =>
      sh -> (ids.length.toLong, ids.map(nTokens).sum, ids.min, ids.max)
    }
    assert(out.keySet == expected.keySet)
    expected.foreach { case (sh, (nd, nt, lo, hi)) =>
      val r = out(sh)
      assert(r._2 == nd && r._3 == nt && r._5 == 1L &&
        r._6 == lo && r._7 == hi, s"shard $sh: $r")
    }
  }

  test("shard hashing stays in [0, nShards) beyond the 2^31.7 id overflow point") {
    // id * 2654435761 wraps Long-negative for id >= ~3.5e9 — real at
    // 100 TB doc counts; pmod (not %) keeps every shard in range.
    // Property-style sweep across the overflow boundary and beyond,
    // plus the epochShuffle path (md5-position pmod).
    val ids = Seq(1L, 3499999999L, 3500000001L, 4000000000L,
      123456789012345L, Long.MaxValue / 2654435761L * 2654435761L / 3)
    val docs = ids.map(i => (i, "a b c")).toDF("doc_id", "text")
    val shards = docs.select(
      graft.operators.CurationOps.shardOf(col("doc_id"), 16).as("s"))
      .as[Int].collect()
    assert(shards.forall(s => s >= 0 && s < 16), shards.toSeq.toString)
    val eShards = CurationOps.epochShuffle(docs, "doc_id", "text", "x", 16)
      .select("shard").as[Int].collect()
    assert(eShards.forall(s => s >= 0 && s < 16), eShards.toSeq.toString)
  }

  test("microRatio: exact below the guard, 6-digit-true and non-throwing above") {
    val rows = Seq(
      (3L, 7L),                                   // exact regime
      (8999999999999L, 9000000000000L),           // just under the guard
      (1000000000000000L, 4000000000000000L),     // 1e15/4e15: ANSI would throw
      (300000000000000L, 300000000000001L))       // ratio ~1 at scale
      .toDF("num", "den")
    val got = rows.withColumn("micro",
        graft.operators.CurationOps.microRatio("num", "den"))
      .select("num", "den", "micro").as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got((3L, 7L)) == 428571L)
    assert(got((8999999999999L, 9000000000000L)) == 999999L)
    // big regime: within 1 micro of the true ratio, no overflow throw
    assert(math.abs(got((1000000000000000L, 4000000000000000L)) - 250000L) <= 1)
    assert(math.abs(got((300000000000000L, 300000000000001L)) - 999999L) <= 1)
  }

  test("microRatio: a contract-violating caller fails loudly, not by zero-division") {
    // num > 9e12 with den < 2^20: the guarded branch would divide by a
    // zero-shifted denominator — the contract CASE must raise a named
    // error instead of an anonymous ANSI divide-by-zero at 100 TB.
    val bad = Seq((10000000000000L, 5L)).toDF("num", "den")
      .withColumn("micro",
        graft.operators.CurationOps.microRatio("num", "den"))
    val e = intercept[Exception] {
      bad.select("micro").collect()
    }
    assert(e.getMessage.contains("microRatio contract violated"))
  }

  test("sampleGate matches the JVM md5 replica and never goes negative") {
    val ids = Seq(0L, 1L, 42L, 999999999999L, Long.MaxValue)
    val got = ids.toDF("id")
      .select(col("id"),
        graft.operators.CurationOps.sampleGate(col("id")).as("g"))
      .as[(Long, Long)].collect().toMap
    ids.foreach { id =>
      assert(got(id) == gateMicro(id), s"gate($id)")
      assert(got(id) >= 0L && got(id) < 1000000L)
    }
  }

  test("quantileGate: histogram threshold is exact; ties at the cut are kept") {
    // scores [10,20,20,30,40], keep 40% → K=2 → largest s with
    // count(>=s) >= 2 is 30 → kept = {30, 40}
    val a = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 30L), (5L, 40L))
      .toDF("id", "score")
    val keptA = graft.operators.CurationOps
      .quantileGate(a, "score", 400000L)
      .select("id").as[Long].collect().toSet
    assert(keptA == Set(4L, 5L))
    // scores [10,20,20,30], keep 50% → K=2 → threshold 20; BOTH 20s
    // kept (tie rule) so the kept count may exceed K
    val b = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 30L))
      .toDF("id", "score")
    val keptB = graft.operators.CurationOps
      .quantileGate(b, "score", 500000L)
      .select("id", "threshold_micro").as[(Long, Long)].collect()
    assert(keptB.map(_._1).toSet == Set(2L, 3L, 4L))
    assert(keptB.forall(_._2 == 20L))
  }

  test("bpePairStats counts frequency-weighted adjacent char pairs") {
    // words: aa(x1) ab(x2) abc(x1); pairs: ab = 2 (from 'ab') + 1
    // (from 'abc') across 2 distinct words, aa and bc once each.
    val docs = Seq((1L, "aa ab"), (2L, "ab"), (3L, "abc"))
      .toDF("doc_id", "text")
    val out = CurationOps.bpePairStats(docs, "text", 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("ab", 3L, 2L), ("aa", 1L, 1L), ("bc", 1L, 1L)))
  }

  test("bpeLearn reproduces the classic low/lower merge sequence") {
    // low x3, lower x1. Round 1: (l,o)=4 ties (o,w)=4, pa asc -> l+o.
    // Round 2: (lo,w)=4. Round 3: (low,e)=1 ties (e,r)=1 -> e+r.
    val docs = Seq((1L, "low low low lower")).toDF("doc_id", "text")
    val out = CurationOps.bpeLearn(docs, "text", 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "l", "o", 4L), (2, "lo", "w", 4L),
      (3, "e", "r", 1L)))
  }

  test("bpeLearn merges greedily left-to-right (overlaps don't double-merge)") {
    // 'aaaa' x2: round 1 counts 3 (a,a) pairs per word = 6 and the
    // greedy replace yields (aa)(aa), NOT (aa)(a)(a); round 2 merges
    // (aa,aa)=2; round 3 has no pairs left and emits nothing.
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val out = CurationOps.bpeLearn(docs, "text", 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "a", "a", 6L), (2, "aa", "aa", 2L)))
  }

  test("bpeLearn with zero rounds returns an empty, correctly-typed merge table") {
    val docs = Seq((1L, "low lower")).toDF("doc_id", "text")
    val out = CurationOps.bpeLearn(docs, "text", 0)
    assert(out.columns.toSeq == Seq("step", "sym_a", "sym_b", "cnt"))
    assert(out.count() == 0)
  }

  test("bpeApplyStats accounts the learned compression; zero rounds = chars") {
    // After l+o, lo+w, e+r: 'low' x3 -> 1 token each, 'lower' ->
    // (low)(er) = 2 tokens; 4 words, 14 chars, 5 BPE tokens.
    val docs = Seq((1L, "low low low lower")).toDF("doc_id", "text")
    val out = CurationOps.bpeApplyStats(docs, "text", 3)
      .as[(Long, Long, Long)].collect().head
    assert(out == ((4L, 14L, 5L)))
    val base = CurationOps.bpeApplyStats(docs, "text", 0)
      .as[(Long, Long, Long)].collect().head
    assert(base == ((4L, 14L, 14L)))
  }

  test("bpeApplyStats on a corpus that exhausts early keeps the last segmentation") {
    // 'aaaa' x2 exhausts after 2 merges ((a,a) then (aa,aa)); round 3
    // finds no pair and the accounting must still see (aaaa) = 1
    // token per word, not an empty frame.
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val out = CurationOps.bpeApplyStats(docs, "text", 3)
      .as[(Long, Long, Long)].collect().head
    assert(out == ((2L, 8L, 2L)))
  }

  test("tokenizerEquity: pooled merges compress sources unevenly") {
    // Pooled learning picks (l,o), (lo,w), (e,r) — all from srcA.
    // srcA compresses 14 chars -> 5 tokens (357142 per million);
    // srcB's words are untouched by the merges: 4 -> 4 (1000000).
    val docs = Seq(
      (1L, "low low low lower", "A"), (2L, "zq xv", "B")
    ).toDF("doc_id", "text", "source")
    val out = CurationOps.tokenizerEquity(docs, "text", "source", 3)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("A", 4L, 14L, 5L, 357142L), ("B", 2L, 4L, 4L, 1000000L)))
  }

  test("bpeLearn batched: accepts top non-overlapping pairs per round") {
    // Round-1 ranked pairs of "low low low lower": (l,o)=4, (o,w)=4,
    // (e,r)=1, (w,e)=1. Window of 4, conservative rule: (l,o) in;
    // (o,w) shares o with rank 1 — out; (e,r) disjoint — in; (w,e)
    // shares w with rank 2 (accepted or not — ranked is what counts)
    // — out. Round 2: (lo,w)=4 in, (w,er)=1 shares w — out. Round 3:
    // (low,er)=1. Steps number globally in (round, rank) order.
    val docs = Seq((1L, "low low low lower")).toDF("doc_id", "text")
    val out = CurationOps.bpeLearn(docs, "text", 3, batch = 4)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "l", "o", 4L), (2, "e", "r", 1L),
      (3, "lo", "w", 4L), (4, "low", "er", 1L)))
  }

  test("bpeLearn batch=1 equals the classic sequential learner") {
    val docs = Seq((1L, "low low low lower newest newest")).toDF("doc_id", "text")
    val seq = CurationOps.bpeLearn(docs, "text", 5)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    val b1 = CurationOps.bpeLearn(docs, "text", 5, batch = 1)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(seq == b1)
  }

  test("applyMerges chunked fold equals the single-expression fold") {
    // 6 merges applied with chunk=2 (3 chunks, 2 barriers) must give
    // byte-identical segmentations to chunk=1000 (one projection) —
    // the bounded-codegen-depth path cannot change results.
    val docs = Seq((1L, "low low lower lowest newest west")).toDF("doc_id", "text")
    val merges = CurationOps.bpeLearn(docs, "text", 6)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
      .map(m => (m._2, m._3)).toSeq
    assert(merges.size >= 4)
    val base = Seq("low", "lower", "lowest", "newest", "west").toDF("w")
      .withColumn("seg", regexp_replace(col("w"), "(.)", "($1)"))
    def segs(chunk: Int): Map[String, String] =
      CurationOps.applyMerges(base, "seg", merges, chunk)
        .select("w", "seg").as[(String, String)].collect().toMap
    assert(segs(2) == segs(1000))
  }

  test("epochShuffle: seeded positions are JVM-reproducible; seeds permute") {
    def pos(seed: String, id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    val docs = (1L to 40L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val out = CurationOps.epochShuffle(docs, "doc_id", "text", "ep1", 4)
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val expected = (1L to 40L).groupBy(i => (pos("ep1", i) % 4).toInt)
    assert(out.keySet == expected.keySet)
    expected.foreach { case (sh, ids) =>
      val ps = ids.map(pos("ep1", _))
      assert(out(sh) == ((sh, ids.size.toLong, ids.size * 3L,
        ps.min, ps.max)), s"shard $sh")
    }
    // a different seed must produce a different permutation
    val out2 = CurationOps.epochShuffle(docs, "doc_id", "text", "ep2", 4)
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    assert(out2 != out.values.toSet)
  }

  test("paddingEfficiency prices naive vs length-sorted batching") {
    // One shard, batch 2, lengths 1/3/2/4 in id order: naive batches
    // (1,3)(2,4) pad to 3*2 + 4*2 = 14; sorted batches (1,2)(3,4) pad
    // to 2*2 + 4*2 = 12; saved = 2e6 DIV 14 = 142857 micro.
    val docs = Seq((1L, "a"), (2L, "a b c"), (3L, "a b"), (4L, "a b c d"))
      .toDF("doc_id", "text")
    val out = CurationOps.paddingEfficiency(docs, "doc_id", "text",
        batch = 2, nShards = 1)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0, 4L, 10L, 14L, 12L, 142857L)))
  }
}
