package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Checkpoints.BarrierOps

/** Deduplication keep-first / keep-last by key in event-time order —
  * semantics of the reference's deduplicate operators
  * (flink-table-runtime .../deduplicate/ProcTimeDeduplicateKeepLastRowFunction.java:32,
  * RowTimeDeduplicateFunction.java; planner StreamExecDeduplicate).
  *
  * Batch: a single `row_number` window — one shuffle on the dedup key,
  * no driver state, AQE handles skewed keys. The streaming keep-last
  * variant lives in graft.streaming (flatMapGroupsWithState upserts).
  */
object Dedup {

  /** Keep the first row per key ordered by `order` (ascending). */
  def keepFirst(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    pick(df, keys, order)

  /** Keep the last row per key ordered by `order` (ascending). */
  def keepLast(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    pick(df, keys, order.map(_.desc))

  private def pick(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact duplicate removal by content hash of the given columns —
    * the hash-groupBy exact-dedup path for large corpora: shuffles on a
    * 128-bit content hash, keeps the min-key representative per group.
    * Returns (representative key, group size).
    */
  def exactByContent(df: DataFrame, idCol: Column, contentCols: Seq[Column]): DataFrame =
    df.groupBy(md5(concat_ws("", contentCols: _*)).as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Connected components over an undirected pair graph
    * (`id_a`, `id_b`) → (`id`, `label`) with label = min node id of the
    * component — the reference's bulk-iteration label propagation
    * (flink-examples-batch ConnectedComponents.java; DataSet bulk
    * iteration, SURVEY §2.12). Driver runs the loop; per-round work is
    * one edge join + one keyed min — fully distributed. Pointer
    * doubling (label ← label-of-label, the large-star/small-star idea)
    * converges in O(log diameter) rounds, and a Checkpoints.barrier
    * (localCheckpoint by default, reliable under the SCALE.md knob)
    * truncates lineage so planning cost stays constant per round.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
                          smallGraphEdgeCap: Long = 1000000L): DataFrame = {
    // Checkpoint BEFORE anything else: the probe below and (on the
    // big-graph path) both symmetric-union branches would otherwise
    // each re-execute the (possibly expensive — LSH mining) pair
    // pipeline; checkpointing the directed pairs runs it once.
    val p = pairs.select(col("id_a"), col("id_b")).barrier()
    // Adaptive strategy pick, the broadcast-join-threshold pattern: a
    // near-dup pair graph is usually TINY relative to the corpus (it
    // holds only the duplicated slice), so when the edge list fits
    // comfortably on the driver, a single union-find pass there beats
    // rounds of distributed joins — same answer, one job. The probe IS
    // the collect: ONE limit-bounded job over the checkpoint fetches
    // up to cap/2+1 directed pairs — union-find is mirror-free
    // (union(a,b) is symmetric), so this replaces the old mirrored
    // probe-count + second collect pass, one fewer scheduled job per
    // call on a path every dedup/cluster operator funnels through.
    // Graphs above the cap take the iterative label-propagation path
    // below, which holds at any scale.
    // Clamp before .toInt: a cap above Int.MaxValue would otherwise
    // overflow into a tiny (or negative) limit and silently shrink the
    // probe — over-Int caps just mean "probe as far as limit() can".
    // The returned frame is a LOCAL relation, so its exact size feeds
    // every downstream join's broadcast decision for free.
    val capInt = math.min(smallGraphEdgeCap / 2,
      (Int.MaxValue - 2).toLong).toInt
    val spark = pairs.sparkSession
    val probe = p.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .limit(capInt + 1).collect()
    if (probe.length <= capInt) {
      import spark.implicits._
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      probe.foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      // Union-by-min keeps every tree's root at its component minimum,
      // so find(x) IS the canonical min label (same invariant as
      // componentsWithinGroups).
      val rows = parent.keysIterator.map(x => (x, find(x))).toSeq
      return spark.createDataset(rows).toDF("id", "label")
    }
    val edges = p
      .union(p.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val nodes = edges.select(col("id_a").as("id")).distinct()
    var labels = nodes.withColumn("label", col("id")).barrier()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val propagated = edges
        .join(labels.withColumnRenamed("id", "id_b").withColumnRenamed("label", "nl"), "id_b")
        .groupBy(col("id_a").as("id")).agg(min(col("nl")).as("pl"))
      val stepped = labels.join(propagated, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("pl"), col("label"))).as("label"))
      val next = stepped.join(
          stepped.select(col("id").as("label"), col("label").as("ll")), Seq("label"), "left")
        .select(col("id"), col("old"), coalesce(col("ll"), col("label")).as("label"))
        .barrier()
      // Convergence check reads the just-materialized checkpoint —
      // no extra join against the previous labels.
      changed = next.filter(col("label") =!= col("old")).count()
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    require(changed == 0,
      s"connected components did not converge in $maxIter rounds ($changed labels still moving)")
    labels
  }

  /** Connected components when every edge is CONFINED to a group (LSH
    * buckets, SemDeDup cells, shards): one shuffle on the group key,
    * then an in-memory union-find per group — no driver loop, no
    * per-round jobs. The group bound is what makes this the at-scale
    * form: state is O(nodes in group), and groups process in parallel.
    * Input (`g`, `id_a`, `id_b`); output (`id`, `label`) with label =
    * min node id of the component, identical to
    * [[connectedComponents]] on the union of all groups (components
    * cannot span groups by construction).
    */
  def componentsWithinGroups(pairs: DataFrame, groupCol: String): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col(groupCol).cast("long").as("g"),
        col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (_, a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { // union by min id keeps labels deterministic
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        parent.keysIterator.map(x => (x, find(x))).toSeq
      }
      .toDF("id", "label")
  }

  /** Priority-based canonical selection over near-dup clusters — the
    * production variant of [[clusterKeepers]]: inside each duplicate
    * cluster the kept document is NOT the minimum id but the best
    * (priority, id) pair — "prefer the curated source over the crawl"
    * rule of C4/RefinedWeb-style pipelines. Selection is one
    * `min(struct(priority, id))` aggregate per cluster (lexicographic
    * struct ordering, partial-aggregable) + a keyed join back; scale
    * shape identical to clusterKeepers.
    */
  def priorityKeepers(docs: DataFrame, idCol: Column, priority: Column,
                      pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    val labeled = docs.select(idCol.as("id"), priority.as("prio"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("cluster"),
        col("prio"))
    val keepers = labeled.groupBy(col("cluster"))
      .agg(min(struct(col("prio"), col("id"))).as("k"))
      .select(col("cluster"), col("k.id").as("keep_id"))
    labeled.join(keepers, Seq("cluster"))
      .select(col("id"), col("cluster"), col("keep_id"),
        (col("id") === col("keep_id")).as("keep"))
  }

  /** Near-duplicate cluster dedup — the step after candidate
    * generation in a corpus dedup pipeline: near-dup pairs become an
    * undirected graph, each connected component is one duplicate
    * cluster, and the minimum doc id in the cluster is kept as the
    * canonical representative (every doc outside any cluster keeps
    * itself). Returns (id, rep_id, keep).
    */
  def clusterKeepers(docs: DataFrame, idCol: Column, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    docs.select(idCol.as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("rep_id"))
      .withColumn("keep", col("id") === col("rep_id"))
  }

  /** SOFT dedup (td44): keep every document and DOWN-WEIGHT duplicated
    * content instead of dropping it — each near-dup cluster's total
    * sampling weight is ~1 (`w_micro = 1e6 DIV cluster_size`, exact
    * integer), so a weighted sampler sees each piece of content once
    * while retaining every surface form (the alternative to hard
    * dropping when near-dups carry real variation — different
    * boilerplate, translations, template instances). Singletons keep
    * weight 1e6. Same cluster machinery as [[clusterKeepers]] plus one
    * label-keyed count aggregate and a join back on the label — the
    * pair graph (only the duplicated slice of the corpus) is the only
    * non-linear input, exactly as in td16/td24/td35.
    */
  def softDedupWeights(docs: DataFrame, idCol: Column,
                       pairs: DataFrame): DataFrame = {
    val labeled = clusterKeepers(docs, idCol, pairs)
      .select(col("id"), col("rep_id"))
    val sizes = labeled.groupBy(col("rep_id"))
      .agg(count(lit(1)).cast("long").as("cluster_size"))
    labeled.join(sizes, Seq("rep_id"))
      .select(col("id"), col("rep_id"), col("cluster_size"),
        wMicroOf(col("cluster_size")).as("w_micro"))
  }

  /** The inverse-cluster-size sampling weight in micros — THE single
    * definition of `1e6 DIV size`, shared by [[softDedupWeights]]
    * (td44/td46) and the incremental emission in
    * graft.streaming.IncrementalCuration (td56/td58). Exact integer
    * floor division (both engines agree); size must be >= 1 (a
    * cluster always contains its members). Kept in lockstep with
    * [[CurationOps.sampleGate]] — the gate passes iff
    * gate < wMicroOf(size), and the batch and incremental manifests
    * only converge if both sites evaluate the identical pair.
    * floor-of-double is exact here: a misround across an integer
    * boundary needs 1/size < ulp(1e6/size)/2, i.e. size > ~4.5e9 —
    * where the quotient is already far below 1 and floors to 0 on
    * both paths.
    */
  private[graft] def wMicroOf(clusterSize: Column): Column =
    floor(lit(1000000L) / clusterSize).cast("long")
}
