package graft

import graft.operators.{AsOfJoin, Dedup, Pregel, WindowOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the custom operator library on tiny inline tables
  * (mirrors the reference's per-operator ITCase style, FIXTURES.md §B1).
  */
class OperatorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  test("cumulate assigns growing step windows within the max window") {
    // base window [0, 14400); event at t=4000s lands in steps ending 7200, 10800, 14400
    val df = Seq((1L, 4000L)).toDF("id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = WindowOps.cumulate(df, col("ts"), 3600L, 14400L)
      .select("win_start", "win_end").as[(Long, Long)].collect().sorted
    assert(out.toSeq == Seq((0L, 7200L), (0L, 10800L), (0L, 14400L)))
  }

  test("dedup keepFirst / keepLast pick the right rows") {
    val df = Seq((1L, 10L, "x"), (1L, 20L, "y"), (2L, 5L, "z")).toDF("k", "t", "v")
    val first = Dedup.keepFirst(df, Seq(col("k")), Seq(col("t")))
      .select("k", "v").as[(Long, String)].collect().toMap
    val last = Dedup.keepLast(df, Seq(col("k")), Seq(col("t")))
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(first == Map(1L -> "x", 2L -> "z"))
    assert(last == Map(1L -> "y", 2L -> "z"))
  }

  test("asOf matches latest right row at or before left time, null before any") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 5L, "l0")).toDF("k", "t", "lv")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15")).toDF("k", "t", "rv")
    val out = AsOfJoin.asOf(left, right, "k", "t", "t", Seq("rv"))
      .select(col("lv"), col("asof.rv")).as[(String, Option[String])]
      .collect().toMap
    assert(out == Map("l0" -> None, "l1" -> Some("r10"), "l2" -> Some("r15")))
  }

  test("asOf equals the brute-force latest-version model on random inputs") {
    import org.scalacheck.{Gen, Prop}
    val rows = Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 20L))
    val inputs = Gen.zip(Gen.listOf(rows), Gen.listOf(rows))
    val prop = Prop.forAll(inputs) { case (ls, rs) =>
      // unique left rows (id payload) and right unique per (k, t)
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val right = rs.distinctBy(r => (r._1, r._2))
        .map { case (k, t) => (k, t, s"v$k@$t") }
      val got =
        if (left.isEmpty) Map.empty[Long, Option[String]]
        else {
          val l = left.toDF("k", "t", "id")
          val r =
            if (right.isEmpty) Seq((0L, 0L, "")).toDF("k", "t", "rv").limit(0)
            else right.toDF("k", "t", "rv")
          AsOfJoin.asOf(l, r, "k", "t", "t", Seq("rv"))
            .select(col("id"), col("asof.rv"))
            .as[(Long, Option[String])].collect().toMap
        }
      val want = left.map { case (k, t, i) =>
        i -> right.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
      }.toMap
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("countTumble chunks rows per key in order") {
    val df = Seq.tabulate(7)(i => (1L, i.toLong)).toDF("k", "t")
    val out = WindowOps.countTumble(df, Seq(col("k")), Seq(col("t")), 3)
      .groupBy("win_id").count().as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 3L, 1L -> 3L, 2L -> 1L))
  }

  test("Pregel SSSP relaxes shortest paths; isolated nodes stay unreached") {
    // 1-2 (1), 2-3 (1), 1-3 (5), 3-4 (2), undirected; 9 isolated.
    val und = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (3L, 4L, 2L))
    val edges = (und ++ und.map(e => (e._2, e._1, e._3)))
      .toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L, 4L, 9L).toDF("n")
    val out = Pregel.sssp(nodes, edges, source = 1L, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 4L,
      9L -> Pregel.Unreached))
  }

  test("Pregel fixed rounds bound path length (1 round reaches 1 hop)") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("n")
    val one = Pregel.sssp(nodes, edges, 1L, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(one(2L) == 1L && one(3L) == Pregel.Unreached)
  }

  test("delta-iteration SSSP converges early and matches the superstep result") {
    // same graph as the relax test; a generous round budget must
    // early-terminate on the empty workset with the converged answer
    val und = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (3L, 4L, 2L))
    val edges = (und ++ und.map(e => (e._2, e._1, e._3)))
      .toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L, 4L, 9L).toDF("n")
    val delta = Pregel.ssspDelta(nodes, edges, source = 1L, rounds = 50)
      .as[(Long, Long)].collect().toMap
    val full = Pregel.sssp(nodes, edges, source = 1L, rounds = 50)
      .as[(Long, Long)].collect().toMap
    assert(delta == full)
    assert(delta == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 4L,
      9L -> Pregel.Unreached))
  }

  test("delta-iteration SSSP: an ODD round budget relaxes exactly `rounds` hops") {
    // a 5-node path: node k is reachable only after k supersteps, so a
    // budget of 3 must reach node 3 but NOT node 4 — the fused 2-hop
    // rounds must not overshoot an odd budget (the final round runs a
    // single plain relaxation)
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val nodes = (0L to 4L).toDF("n")
    def reach(rounds: Int): Map[Long, Long] =
      Pregel.ssspDelta(nodes, edges, source = 0L, rounds = rounds)
        .as[(Long, Long)].collect().toMap
    val r3 = reach(3)
    assert(r3(3L) == 3L, "3 rounds must reach node 3")
    assert(r3(4L) == Pregel.Unreached,
      "an odd budget of 3 must NOT reach the 4th hop (no overshoot)")
    val r1 = reach(1)
    assert(r1(1L) == 1L && r1(2L) == Pregel.Unreached)
    // even budgets keep the fused behavior
    val r4 = reach(4)
    assert(r4(4L) == 4L)
  }

  test("delta iteration's batched convergence probe changes cost, never the result") {
    val und = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (3L, 4L, 2L))
    val edges = (und ++ und.map(e => (e._2, e._1, e._3)))
      .toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("n")
    val init = nodes.select(col("n"),
      when(col("n") === 1L, 0L).otherwise(Pregel.Unreached).as("attr"))
    def run(probeEvery: Int) =
      Pregel.deltaIterate(init, init.where(col("n") === 1L),
          maxRounds = 50, probeEvery = probeEvery)(
        step = ws => ws.join(edges, col("n") === col("src"))
          .select(col("dst"), (col("attr") + col("w")).as("__c"))
          .groupBy(col("dst")).agg(min(col("__c")).as("cand"))
          .withColumnRenamed("dst", "n"),
        better = (cand, attr) => cand < attr)
        .as[(Long, Long)].collect().toMap
    assert(run(3) == run(1))
    // an EMPTY initial workset terminates immediately at any probe cadence
    val none = Pregel.deltaIterate(init, init.where(col("n") === 99L),
        maxRounds = 50, probeEvery = 3)(
      step = identity, better = (c, a) => c < a)
      .as[(Long, Long)].collect().toMap
    assert(none == Map(1L -> 0L, 2L -> Pregel.Unreached,
      3L -> Pregel.Unreached, 4L -> Pregel.Unreached))
  }

  test("general iterate with checkpointing equals the unchecked plan (sum propagation)") {
    // A NON-monotone body (message sums) so iterateMonotone doesn't
    // apply: 6 rounds crossing the default checkpoint interval must
    // produce exactly the interval-0 (never-checkpoint) result.
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)).toDF("src", "dst", "w")
    val nodes = Seq((1L, 1L), (2L, 10L), (3L, 100L)).toDF("n", "attr")
    def run(interval: Int) = Pregel.iterate(nodes, edges, rounds = 6, interval)(
      sendMsg = (attr, w) => attr + w,
      mergeMsg = m => sum(m),
      update = (old, msg) => coalesce(msg, old))
      .as[(Long, Long)].collect().toMap
    assert(run(4) == run(0))
  }

  test("label propagation separates bridged triangles deterministically") {
    // Two triangles joined by one bridge edge (3-10): after 3 sync
    // rounds with min tie-breaks each triangle settles on one label and
    // the bridge does NOT merge them (hand-traced trajectory).
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("a", "b")
    val got = Pregel.labelPropagation(und, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L))
  }
}
