package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.BarrierOps

/** Vertex-centric bulk-synchronous iteration — the general form of the
  * reference's Gelly scatter-gather / vertex-centric APIs
  * (flink-libraries/flink-gelly .../spargel/ScatterGatherIteration.java,
  * .../pregel/VertexCentricIteration.java), of which it01/it02 were
  * hand-rolled instances. One superstep = ONE edge join + ONE keyed
  * message aggregate + ONE vertex join, fully distributed; supersteps
  * compose LAZILY (the it02 pattern), so `rounds` supersteps run as a
  * single linear plan with the edge exchange reused across rounds
  * instead of a checkpoint per round — at cluster scale the edge list
  * shuffles once and every round streams over it.
  *
  * Fixed-round execution (no convergence test) is deliberate: it keeps
  * results an exact function of (graph, rounds), which is what lets a
  * recursive-CTE oracle replay the computation round for round; callers
  * needing convergence-driven stopping wrap it in the
  * [[Dedup.connectedComponents]]-style driver loop with
  * Checkpoints.barrier lineage truncation.
  */
object Pregel {

  /** Iteration shuffle sizing: a driver-loop iteration pays per-task
    * scheduling latency EVERY round, and its in-flight state (frontier,
    * messages, solution set) is usually orders smaller than the
    * session's shuffle sizing assumes — so target ~256k edge rows per
    * task with a floor of 8, and return None (keep session defaults +
    * AQE) once the data is big enough to need them. Measured on the
    * it05 graph (1.17M edges, sf0.1): 32→8 partitions with AQE's
    * per-stage re-planning off cut the iteration 4.2s→2.2s; at 100×
    * the formula exceeds the session default and defers to it.
    */
  private[graft] def iterationPartitions(spark: org.apache.spark.sql.SparkSession,
                                  edgeRows: Long): Option[Int] = {
    val sessionP = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val p = math.max(8L, edgeRows / 262144L)
    if (p < sessionP) Some(p.toInt) else None
  }

  /** Run `body` with the iteration's shuffle sizing (and AQE's
    * per-stage re-planning off — every plan in the loop is tiny and
    * identical in shape, so adaptive re-optimization is pure latency).
    * Session values are restored after; only the loop's own
    * materializations (localCheckpoint/probe jobs) run under the
    * override, the returned frame's downstream consumers see the
    * session defaults again.
    */
  private[graft] def withIterationConf[T](spark: org.apache.spark.sql.SparkSession,
                                   partitions: Option[Int])(body: => T): T =
    partitions match {
      case None => body
      case Some(p) =>
        val oldP = spark.conf.get("spark.sql.shuffle.partitions")
        val oldA = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.shuffle.partitions", p.toString)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try body
        finally {
          spark.conf.set("spark.sql.shuffle.partitions", oldP)
          spark.conf.set("spark.sql.adaptive.enabled", oldA)
        }
    }

  /** Run `rounds` supersteps over `vertices` (`n`, `attr`) and `edges`
    * (`src`, `dst`, `w`).
    *
    * @param sendMsg  message from a source vertex along an edge:
    *                 (src attr, edge weight) => message value
    * @param mergeMsg aggregate over all messages reaching a vertex
    *                 (e.g. `min`, `sum` — must be partial-aggregable)
    * @param update   (old attr, merged msg — null when no messages
    *                 arrived) => new attr
    */
  def iterate(vertices: DataFrame, edges: DataFrame, rounds: Int,
              checkpointInterval: Int = 4)(
      sendMsg: (Column, Column) => Column,
      mergeMsg: Column => Column,
      update: (Column, Column) => Column): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w")).barrier()
    var v = vertices.select(col("n"), col("attr"))
    for (r <- 0 until rounds) {
      val msgs = v.join(e, col("n") === col("src"))
        .select(col("dst"), sendMsg(col("attr"), col("w")).as("__m"))
        .groupBy(col("dst")).agg(mergeMsg(col("__m")).as("__msg"))
      v = v.join(msgs, col("n") === col("dst"), "left")
        .select(col("n"), update(col("attr"), col("__msg")).as("attr"))
      // Each round references `v` twice (message join + update join),
      // so the lazy plan doubles per round; truncating lineage every
      // `checkpointInterval` rounds caps the tree at 2^interval
      // references while keeping most rounds job-free. Monotone
      // algorithms should still prefer [[iterateMonotone]] — one
      // reference per round, fully lazy, zero per-round jobs.
      if (checkpointInterval > 0 && (r + 1) % checkpointInterval == 0
          && r + 1 < rounds) {
        v = v.barrier()
      }
    }
    v
  }

  /** Monotone supersteps fused via zero-weight self-loops: when the
    * vertex update is "keep the better of old attr and merged message"
    * (least/greatest-style) and `sendMsg(attr, selfWeight) == attr`,
    * adding a self-loop per vertex makes the old attribute just
    * another incoming message — each superstep then references the
    * vertex frame ONCE (one join + one aggregate), so the logical
    * plan stays LINEAR in rounds. The general [[iterate]] references
    * the vertex frame twice per round (message join + update join),
    * doubling the plan each superstep; physical exchange reuse keeps
    * that executable but analysis/codegen cost still grows with the
    * tree. For min/max-propagation algorithms (SSSP, reachability,
    * label propagation) this fused form is the at-scale shape.
    */
  def iterateMonotone(vertices: DataFrame, edges: DataFrame, rounds: Int,
                      selfWeight: Column = lit(0L))(
      sendMsg: (Column, Column) => Column,
      mergeMsg: Column => Column): DataFrame = {
    // No per-round materialization here — the supersteps compose into
    // ONE lazy plan (a single job; AQE sizes every stage), so the
    // driver-loop latency that iterationPartitions exists for never
    // arises. Only deltaIterate, whose convergence probe forces an
    // action per round, needs the iteration sizing.
    val e = edges.select(col("src"), col("dst"), col("w"))
      .union(vertices.select(col("n").as("src"), col("n").as("dst"),
        selfWeight.as("w")))
      .repartition(col("src")) // one-time exchange; reused every round
      .barrier()
    var v = vertices.select(col("n"), col("attr"))
    for (_ <- 0 until rounds) {
      v = v.join(e, col("n") === col("src"))
        .select(col("dst"), sendMsg(col("attr"), col("w")).as("__m"))
        .groupBy(col("dst")).agg(mergeMsg(col("__m")).as("attr"))
        .withColumnRenamed("dst", "n")
    }
    v
  }

  /** Sentinel "unreachable" distance for [[sssp]] — large enough to
    * dominate any real path, small enough that sentinel + weight can
    * never overflow a long.
    */
  val Unreached: Long = 1L << 60

  /** Fixed-round Bellman-Ford single-source shortest paths over
    * integer-weighted edges: after `rounds` supersteps every node
    * carries the cheapest distance using at most `rounds` hops — an
    * exact long-arithmetic function of the graph that a SQL oracle
    * reproduces. Returns (`n`, `attr` = distance, [[Unreached]] where
    * no ≤rounds-hop path exists).
    */
  def sssp(nodes: DataFrame, edges: DataFrame, source: Long,
           rounds: Int): DataFrame =
    iterateMonotone(
      nodes.select(col("n"),
        when(col("n") === source, lit(0L)).otherwise(lit(Unreached)).as("attr")),
      edges, rounds)(
      sendMsg = (attr, w) => attr + w, // sentinel + w still >> any path
      mergeMsg = m => min(m)) // self-loop w=0 carries the old attr
      // iterateMonotone rebuilds the frame from message DESTINATIONS,
      // so a directed edge list can surface dst-only vertices absent
      // from `nodes`; the semi-join restores the contract that the
      // output vertex set is exactly the input vertex set.
      .join(nodes.select(col("n")), Seq("n"), "left_semi")

  /** DataSet delta iteration (reference flink-java
    * .../operators/DeltaIteration.java; Gelly's scatter-gather runs on
    * it): iterate a (solution set, workset) pair until the workset
    * empties or `maxRounds` passes. Each round the caller's `step`
    * derives candidate updates FROM THE WORKSET ONLY (the delta — the
    * whole point of the workset model: untouched solution entries cost
    * nothing), the framework applies strict improvements to the
    * solution keyed by `n`, and the improved entries become the next
    * workset. Both frames are localCheckpointed per round (driver-loop
    * lineage truncation, the it01 pattern) and the workset-empty test
    * is a limit-probe, never a full count.
    *
    * @param solution0 initial solution set (`n`, `attr`)
    * @param step      workset => candidate (`n`, `cand`) values; a
    *                  candidate replaces the solution attr iff
    *                  `better(cand, attr)` holds
    * @param better    strict improvement predicate (e.g. `<` for
    *                  shortest distances)
    * @param probeEvery run the workset-empty convergence probe every
    *                  k-th round instead of every round (k > 1 trades
    *                  at most k-1 cheap no-op rounds after convergence
    *                  — an empty workset makes every downstream frame
    *                  empty — for k-1 fewer probe JOBS per k rounds;
    *                  each probe is a scheduled Spark job whose
    *                  driver-loop latency, not its scan, is the cost)
    */
  def deltaIterate(solution0: DataFrame, workset0: DataFrame, maxRounds: Int,
                   shufflePartitions: Option[Int] = None,
                   probeEvery: Int = 1)(
      step: DataFrame => DataFrame,
      better: (Column, Column) => Column): DataFrame =
      withIterationConf(solution0.sparkSession, shufflePartitions) {
    require(probeEvery >= 1, s"probeEvery must be >= 1, got $probeEvery")
    var solution = solution0.select(col("n"), col("attr")).barrier()
    var workset = workset0.select(col("n"), col("attr")).barrier()
    var round = 0
    while (round < maxRounds &&
        (round % probeEvery != 0 || workset.limit(1).count() > 0)) {
      val cands = step(workset)
      // ONE join and ONE materialization per round: the joined frame
      // carries both next-round outputs — `imp` is the strict
      // improvement (null = no change), so the new solution is a
      // coalesce projection and the new workset a filter projection of
      // the SAME checkpointed frame. (The naive form joins `solution`
      // twice — once to test improvement, once to apply it — and
      // checkpoints both results: 2 shuffles + 2 jobs per round where
      // one of each suffices. The early-termination probe then runs on
      // checkpointed data: a limit(1) scan, not a recompute.)
      // shuffle_hash on the candidate (delta) side: both inputs are
      // already hash-partitioned on `n` (solution is a projection of
      // last round's join output, cands of a keyed aggregate), so the
      // hash join runs exchange-free AND sort-free — SMJ would re-sort
      // the full solution every round; building a hash map from the
      // shrinking delta is the right side at any scale.
      val joined = solution.join(cands.hint("shuffle_hash"), Seq("n"), "left")
        .select(col("n"), col("attr"),
          when(better(col("cand"), col("attr")), col("cand")).as("imp"))
        .barrier()
      solution = joined.select(col("n"),
        coalesce(col("imp"), col("attr")).as("attr"))
      workset = joined.where(col("imp").isNotNull)
        .select(col("n"), col("imp").as("attr"))
      round += 1
    }
    solution
  }

  /** SSSP on the delta-iteration substrate: the workset holds only
    * vertices whose distance improved last round, so settled regions
    * of the graph stop generating join work — the reference's flagship
    * delta-iteration example. Equivalent to `rounds` Bellman-Ford
    * supersteps when it runs the full budget, and to the converged
    * fixpoint when the workset empties early (further rounds are
    * no-ops), so a fixed-round oracle replays it exactly either way.
    */
  def ssspDelta(nodes: DataFrame, edges: DataFrame, source: Long,
                rounds: Int): DataFrame = {
    val spark = nodes.sparkSession
    // `edges` is scanned twice (sizing count + the repartition below) —
    // callers pass a materialized frame (it05 checkpoints it already).
    val parts = iterationPartitions(spark, edges.count())
    val e0 = edges.select(col("src"), col("dst"), col("w"))
    // Pre-partition the edge list on the probe key BEFORE the one-time
    // checkpoint — at the iteration's partition count: LogicalRDD
    // preserves the physical partitioning, so every round's
    // workset⋈edges join exchanges only the (shrinking) workset — the
    // big side shuffles once for the whole iteration, not once per
    // round. At cluster scale this is the difference between a
    // per-superstep network pass over the graph and none.
    val e = parts.fold(e0.repartition(col("src")))(
      p => e0.repartition(p, col("src"))).barrier()
    val init = nodes.select(col("n"),
      when(col("n") === source, lit(0L)).otherwise(lit(Unreached)).as("attr"))
    // One Bellman-Ford relaxation from a frontier: frontier ⋈ edges →
    // min candidate distance per destination. shuffle_hash from the
    // workset side: e is pre-partitioned on src at the iteration
    // count, the workset arrives partitioned on n — no exchange, no
    // per-round sort of the edge list, and no per-round
    // broadcast-collect job (BHJ would run one per round).
    def relax(ws: DataFrame): DataFrame =
      ws.hint("shuffle_hash").join(e, col("n") === col("src"))
        .select(col("dst"), (col("attr") + col("w")).as("__c"))
        .groupBy(col("dst")).agg(min(col("__c")).as("cand"))
        .withColumnRenamed("dst", "n")
    // TWO relaxations fused per scheduled round: candidates = min over
    // all 1- and 2-edge paths from the frontier, combined in ONE lazy
    // plan so each fused round costs one driver-scheduled job instead
    // of two — the driver-loop scheduling latency, not shuffle volume,
    // is the measured floor of this iteration at local scale. h1 feeds
    // both the union and the second hop; its exchange is reused within
    // the job (ReusedExchange), so the duplicate subtree costs only the
    // (frontier-sized) post-shuffle aggregation. Unfiltered 2-hop
    // candidates may be stale (worse than the solution's current
    // distance) — they lose the `better` test downstream, costing
    // frontier×degree² candidate rows, bounded here by the
    // degree-capped benchmark graph; correctness is untouched since
    // BF relaxation is monotone. An ODD budget runs (rounds-1)/2 fused
    // rounds plus one PLAIN final relaxation (the step closure counts
    // its driver-sequential invocations), so total relaxations = rounds
    // exactly and a fixed-budget oracle replays either parity.
    val scheduled = (rounds + 1) / 2
    var invocation = 0
    deltaIterate(init, init.where(col("n") === source), scheduled,
        parts, probeEvery = 3)(
      step = ws => {
        invocation += 1
        val h1 = relax(ws)
        if (rounds % 2 == 1 && invocation == scheduled) h1
        else {
          val h2 = relax(h1.select(col("n"), col("cand").as("attr")))
          h1.unionByName(h2).groupBy(col("n")).agg(min(col("cand")).as("cand"))
        }
      },
      better = (cand, attr) => cand < attr)
  }

  /** Per-node triangle membership counts over an undirected edge list
    * `und` (`a`, `b`, id-normalized a<b, no duplicates) — Gelly's
    * TriangleEnumerator (flink-libraries/flink-gelly/.../library/
    * TriangleEnumerator.java), via the scalable degree-ordered
    * algorithm: orient each edge from its lower-(degree, id) endpoint
    * to the higher one, enumerate wedges from the oriented list
    * (fan-out bounded by the SMALLER endpoint degree — hub nodes never
    * self-join, the O(E^1.5) bound), close each wedge against the
    * undirected set with a plain equi-join (both pair encodings are
    * id-ordered). Each triangle surfaces exactly once: its unique
    * minimum-(degree, id) apex.
    */
  def triangleCounts(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("n")).union(und.select(col("b")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val ori = und
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("lo"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("b")).otherwise(col("a")).as("hi"))
      .barrier()
    val wedges = ori.as("e1").join(ori.as("e2"),
        col("e1.lo") === col("e2.lo") && col("e1.hi") < col("e2.hi"))
      .select(col("e1.lo").as("apex"), col("e1.hi").as("u"), col("e2.hi").as("v"))
    val tri = wedges.join(und, col("u") === col("a") && col("v") === col("b"))
      .select(col("apex"), col("u"), col("v"))
    tri.select(explode(array(col("apex"), col("u"), col("v"))).as("supp"))
      .groupBy(col("supp")).agg(count(lit(1)).cast("long").as("n_tri"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) for a FIXED
    * round count with deterministic ties: every node starts as its own
    * label; each round it adopts its neighbours' most frequent label,
    * ties broken toward the smallest label — fully deterministic, so
    * the whole trajectory is oracle-replicable round by round (the
    * async/random-order variant converges better but can't be
    * hash-checked; same plan shape either way). Per round: ONE keyed
    * join (neighbour labels) + ONE count aggregate + ONE rank window,
    * all at the iteration's shuffle sizing; labels are checkpointed per
    * round so the plan doesn't grow with rounds. Input `und` is an
    * undirected edge list (a, b), mirrored internally. Output:
    * (id, label) for every endpoint.
    */
  def labelPropagation(und: DataFrame, rounds: Int): DataFrame = {
    val spark = und.sparkSession
    val edges0 = und.select(col("a"), col("b"))
      .unionAll(und.select(col("b").as("a"), col("a").as("b")))
      .distinct().barrier()
    val parts = iterationPartitions(spark, edges0.count())
    withIterationConf(spark, parts) {
      val edges = parts.map(p => edges0.repartition(p, col("b")))
        .getOrElse(edges0).barrier()
      var labels = edges.select(col("a").as("id")).distinct()
        .withColumn("label", col("id")).barrier()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("a")).orderBy(col("c").desc, col("nl"))
      for (_ <- 1 to rounds) {
        labels = edges
          .join(labels.select(col("id").as("b"), col("label").as("nl")), "b")
          .groupBy(col("a"), col("nl")).agg(count(lit(1)).as("c"))
          .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
          .select(col("a").as("id"), col("nl").as("label"))
          .barrier()
      }
      labels
    }
  }
}
