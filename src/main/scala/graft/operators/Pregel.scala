package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * [[Dedup.connectedComponents]]-style driver loop with localCheckpoint
  * lineage truncation.
  */
object Pregel {

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
  def iterate(vertices: DataFrame, edges: DataFrame, rounds: Int)(
      sendMsg: (Column, Column) => Column,
      mergeMsg: Column => Column,
      update: (Column, Column) => Column): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w")).localCheckpoint()
    var v = vertices.select(col("n"), col("attr"))
    for (_ <- 0 until rounds) {
      val msgs = v.join(e, col("n") === col("src"))
        .select(col("dst"), sendMsg(col("attr"), col("w")).as("__m"))
        .groupBy(col("dst")).agg(mergeMsg(col("__m")).as("__msg"))
      v = v.join(msgs, col("n") === col("dst"), "left")
        .select(col("n"), update(col("attr"), col("__msg")).as("attr"))
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
    val e = edges.select(col("src"), col("dst"), col("w"))
      .union(vertices.select(col("n").as("src"), col("n").as("dst"),
        selfWeight.as("w")))
      .localCheckpoint()
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
    */
  def deltaIterate(solution0: DataFrame, workset0: DataFrame, maxRounds: Int)(
      step: DataFrame => DataFrame,
      better: (Column, Column) => Column): DataFrame = {
    var solution = solution0.select(col("n"), col("attr")).localCheckpoint()
    var workset = workset0.select(col("n"), col("attr")).localCheckpoint()
    var round = 0
    while (round < maxRounds && workset.limit(1).count() > 0) {
      val cands = step(workset)
      val improved = cands.join(solution, Seq("n"))
        .where(better(col("cand"), col("attr")))
        .select(col("n"), col("cand").as("attr"))
        .localCheckpoint()
      solution = solution.join(improved.select(col("n"), col("attr").as("__new")),
          Seq("n"), "left")
        .select(col("n"), coalesce(col("__new"), col("attr")).as("attr"))
        .localCheckpoint()
      workset = improved
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
    val e = edges.select(col("src"), col("dst"), col("w")).localCheckpoint()
    val init = nodes.select(col("n"),
      when(col("n") === source, lit(0L)).otherwise(lit(Unreached)).as("attr"))
    deltaIterate(init, init.where(col("n") === source), rounds)(
      step = ws => ws.join(e, col("n") === col("src"))
        .select(col("dst"), (col("attr") + col("w")).as("__c"))
        .groupBy(col("dst")).agg(min(col("__c")).as("cand"))
        .withColumnRenamed("dst", "n"),
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
      .localCheckpoint()
    val wedges = ori.as("e1").join(ori.as("e2"),
        col("e1.lo") === col("e2.lo") && col("e1.hi") < col("e2.hi"))
      .select(col("e1.lo").as("apex"), col("e1.hi").as("u"), col("e2.hi").as("v"))
    val tri = wedges.join(und, col("u") === col("a") && col("v") === col("b"))
      .select(col("apex"), col("u"), col("v"))
    tri.select(explode(array(col("apex"), col("u"), col("v"))).as("supp"))
      .groupBy(col("supp")).agg(count(lit(1)).cast("long").as("n_tri"))
  }
}
