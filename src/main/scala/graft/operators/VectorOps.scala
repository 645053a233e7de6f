package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Checkpoints.BarrierOps

/** Embedding-vector primitives for similarity search over an
  * `array<float>` column: exact cosine (brute-force baseline) and a
  * sign-random-projection LSH bucketing for the at-scale path.
  *
  * Dots and norms are computed on the exploded (id, dim, x) index with
  * exact scaled-integer accumulation: results are independent of
  * aggregation order (so distributed partial aggregation is safe AND
  * bit-reproducible by the oracle), and the whole plan stays in
  * whole-stage codegen — per-pair higher-order-function folds are
  * interpreted and turn quadratic at pair scope.
  */
object VectorOps {

  /** Exact order-independent accumulation of small doubles: scale to
    * integer picometer-ish units (1e12), floor, sum as LONG (codegen
    * vectorized — Decimal128 sums are ~50x slower at this volume), and
    * rescale. Deterministic in any aggregation order, reproducible in
    * DuckDB with the same floor/scale expression. Valid while
    * |term| * 1e12 < 2^63 / n_terms — fine for unit-ish embedding
    * components.
    */
  private def scaledSum(c: Column): Column =
    sum(floor(c * lit(1e12)).cast("long")).cast("double") / lit(1e12)

  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Per-pair fold versions (sequential, deterministic) — for small
    * candidate sets (e.g. within an LSH bucket) and tests.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exploded (id, d, x) view of a vector column. */
  def explodeVec(df: DataFrame, idCol: String, vecCol: String,
                 idAlias: String): DataFrame =
    df.select(col(idCol).as(idAlias),
      posexplode(toDouble(col(vecCol))).as(Seq("d", "x")))

  /** Per-vector L2 norms (exact decimal accumulation). */
  def norms(df: DataFrame, idCol: String, vecCol: String,
            idAlias: String): DataFrame =
    explodeVec(df, idCol, vecCol, idAlias)
      .groupBy(col(idAlias))
      .agg(sqrt(scaledSum(col("x") * col("x"))).as("nrm"))

  import graft.functions.VectorExpressions.dot_scaled

  private def scaledToDouble(c: Column): Column = c.cast("double") / lit(1e12)

  /** (id, v: array<double>, nrm) with the cast and norm MATERIALIZED
    * through a round-robin shuffle. Two jobs done by one exchange:
    * the interpreted `transform` lambda can't be re-inlined into
    * downstream per-pair predicates (it's evaluated once per row, on
    * the map side), and the stream side of the pair join gets
    * `defaultParallelism` partitions instead of one-per-parquet-file —
    * a single small file would otherwise serialize the whole O(n²)
    * pair scan onto one core.
    */
  private def prepped(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val parallelism = vecs.sparkSession.sparkContext.defaultParallelism
    vecs.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", sqrt(scaledToDouble(dot_scaled(col("v"), col("v")))))
      .repartition(parallelism)
  }

  /** Row cap for the exact all-pairs/brute-force baselines: above it a
    * call must opt in with forceExact=true, so the O(n²) paths can't be
    * reached by accident at corpus scale — the intended at-scale
    * operators are srpBucket (te03), ivfTopK/ivfKmeansTopK (te05/te06)
    * and pqTopK (te07), which answer the same queries from bucketed /
    * cell-probed candidate sets.
    */
  val ExactBaselineMaxRows: Long = 100000L

  private def guardExact(op: String, vecs: DataFrame, forceExact: Boolean,
                         scalePath: String): Unit =
    if (!forceExact) {
      // Probe with limit(cap+1) so the guard job stops scanning after
      // cap+1 rows — O(cap), never O(corpus). A full count() here would
      // add a corpus-sized job to every guarded call.
      val n = vecs.limit(ExactBaselineMaxRows.toInt + 1).count()
      require(n <= ExactBaselineMaxRows,
        s"$op is an exact O(n^2) baseline and the input has more than " +
          s"$ExactBaselineMaxRows rows; use $scalePath at this scale, " +
          "or pass forceExact=true to insist")
    }

  /** All pairs (id_a < id_b) with cosine ≥ threshold — exact brute
    * force: pair join + one codegen'd dot-product loop per pair
    * (DotScaledLong). Inherently O(n²); the correctness baseline — use
    * srpBucket to prune candidates at scale (calls above
    * [[ExactBaselineMaxRows]] rows must opt in via forceExact). The
    * right side is broadcast once (with v/nrm precomputed); the left
    * streams with full parallelism, so pair work is evenly spread
    * across executors.
    */
  def cosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
                  threshold: Double, forceExact: Boolean = false): DataFrame = {
    guardExact("cosinePairs", vecs, forceExact, "srpBucket + a bucket join")
    val n = prepped(vecs, idCol, vecCol)
    val a = n.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos", round(
        scaledToDouble(dot_scaled(col("va"), col("vb"))) / (col("na") * col("nb")), 6))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** IVF (inverted-file) ANN: a coarse quantizer assigns every vector
    * to its nearest-centroid cell; a query probes only its `nprobe`
    * nearest cells and re-ranks exactly inside them, touching
    * ~nprobe/nlist of the corpus instead of all of it. Centroids are
    * the first `nlist` corpus vectors — deterministic, so the whole
    * operator is oracle-checkable; a production fit would k-means a
    * sample instead, with the identical plan shape. Scale anatomy:
    * assignment = crossJoin against BROADCAST centroids (nlist×dim
    * floats — tiny) + one shuffle by id for the per-vector argmax;
    * search = the tiny probe list broadcast against the cell-keyed
    * corpus, so the corpus is never reshuffled. The cell id is the
    * natural partitioning/bucketing key for a stored IVF index.
    *
    * `isQuery` receives the id column and selects the query subset.
    */
  def ivfTopK(vecs: DataFrame, idCol: String, vecCol: String,
              isQuery: Column => Column, nlist: Int, nprobe: Int,
              k: Int): DataFrame = {
    val ranked = ivfRanked(vecs, idCol, vecCol, nlist)
    val cells = ranked.where(col("crk") === 1)
      .select(col("id").as("vec_id"), col("cid").as("cell"),
        col("v").as("cv2"), col("nrm").as("cn2"))
    val probes = ranked.where(isQuery(col("id")) && col("crk") <= nprobe)
      .select(col("id").as("query_id"), col("cid").as("cell"),
        col("v").as("qv"), col("nrm").as("qn"))
    ivfServe(cells, probes, k)
  }

  /** Attribute-FILTERED ANN over the IVF index: "nearest neighbours of
    * q AMONG vectors sharing q's attribute" — the filtered
    * vector-search shape retrieval stacks need for tenant / language /
    * label / licence scoping. The attribute equality lands in the
    * probe⋈cell JOIN CONDITION, so non-matching candidates are
    * discarded by the join hash lookup BEFORE any dot product is
    * evaluated (pre-filtering, not rerank-then-discard — a post-filter
    * of an unfiltered top-k can return FEWER than k survivors or none).
    * With a stored index partitioned by (cell, attr) — te17's layout
    * plus the attribute — the same broadcast join prunes whole
    * partitions via dynamic partition pruning instead. nprobe should
    * rise with filter selectivity (an equality over `m` uniform values
    * leaves ~1/m of each probed cell usable), which is why it stays a
    * caller-chosen knob, same contract as [[ivfTopK]].
    */
  def ivfFilteredTopK(vecs: DataFrame, idCol: String, vecCol: String,
                      attrCol: String, isQuery: Column => Column,
                      nlist: Int, nprobe: Int, k: Int): DataFrame = {
    val attrs = vecs.select(col(idCol).as("id"), col(attrCol).as("attr"))
    val ranked = ivfRanked(vecs, idCol, vecCol, nlist).join(attrs, "id")
    val cells = ranked.where(col("crk") === 1)
      .select(col("id").as("vec_id"), col("cid").as("ccell"),
        col("v").as("cv2"), col("nrm").as("cn2"), col("attr").as("cattr"))
    val probes = ranked.where(isQuery(col("id")) && col("crk") <= nprobe)
      .select(col("id").as("query_id"), col("cid").as("cell"),
        col("v").as("qv"), col("nrm").as("qn"), col("attr").as("qattr"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(probes)
      .join(cells, col("cell") === col("ccell") && col("qattr") === col("cattr"))
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(
        scaledToDouble(dot_scaled(col("qv"), col("cv2"))) / (col("qn") * col("cn2")), 6))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("qattr").as("attr"),
        col("cos"), col("rk"))
  }

  /** Hard-negative mining, exact baseline: for each anchor (query) the
    * top-k most cosine-similar vectors with a DIFFERENT label — the
    * negatives a contrastive trainer wants (similar yet wrong). This
    * is [[bruteForceTopK]]'s shape plus the label-inequality residual,
    * and like every exact pair baseline it is GUARDED: above
    * [[ExactBaselineMaxRows]] rows the broadcast of the full candidate
    * frame would OOM long before the O(n²) time matters — use
    * [[ivfHardNegatives]] at that scale, or pass forceExact to insist.
    */
  def hardNegativesTopK(vecs: DataFrame, idCol: String, vecCol: String,
                        labelCol: String, isQuery: Column => Column, k: Int,
                        forceExact: Boolean = false): DataFrame = {
    guardExact("hardNegativesTopK", vecs, forceExact, "ivfHardNegatives")
    val parallelism = vecs.sparkSession.sparkContext.defaultParallelism
    val v = vecs.select(col(idCol).as("id"), col(labelCol).as("label"),
        toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", sqrt(scaledToDouble(dot_scaled(col("v"), col("v")))))
      .repartition(parallelism)
    val q = v.filter(isQuery(col("id")))
      .select(col("id").as("query_id"), col("label").as("qlabel"),
        col("v").as("qv"), col("nrm").as("qn"))
    val c = v.select(col("id").as("vec_id"), col("label"),
      col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    q.join(broadcast(c), col("query_id") =!= col("vec_id") &&
        col("qlabel") =!= col("label"))
      .withColumn("cos", round(
        scaledToDouble(dot_scaled(col("qv"), col("cv"))) / (col("qn") * col("cn")), 6))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("query_id"), col("qlabel"), col("vec_id"),
        col("label"), col("cos"), col("rk"))
  }

  /** Hard-negative mining at scale: [[ivfFilteredTopK]]'s anatomy with
    * the attribute predicate FLIPPED — the label INEQUALITY sits in the
    * probe⋈cell join condition, so same-label candidates are discarded
    * by the hash join before any dot product runs, and the corpus is
    * only touched inside probed cells (te18's shape, te27's semantics).
    * Label inequality is near-unselective (most of a cell has a
    * different label), so recall behaves like the unfiltered [[ivfTopK]]
    * — nprobe does not need the selectivity scaling te18 documents.
    */
  def ivfHardNegatives(vecs: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, isQuery: Column => Column,
                       nlist: Int, nprobe: Int, k: Int): DataFrame = {
    val attrs = vecs.select(col(idCol).as("id"), col(labelCol).as("attr"))
    val ranked = ivfRanked(vecs, idCol, vecCol, nlist).join(attrs, "id")
    val cells = ranked.where(col("crk") === 1)
      .select(col("id").as("vec_id"), col("cid").as("ccell"),
        col("v").as("cv2"), col("nrm").as("cn2"), col("attr").as("cattr"))
    val probes = ranked.where(isQuery(col("id")) && col("crk") <= nprobe)
      .select(col("id").as("query_id"), col("cid").as("cell"),
        col("v").as("qv"), col("nrm").as("qn"), col("attr").as("qattr"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(probes)
      .join(cells, col("cell") === col("ccell") && col("qattr") =!= col("cattr"))
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(
        scaledToDouble(dot_scaled(col("qv"), col("cv2"))) / (col("qn") * col("cn2")), 6))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") <= k)
      .select(col("query_id"), col("qattr").as("qlabel"), col("vec_id"),
        col("cattr").as("label"), col("cos"), col("rk"))
  }

  /** The coarse-quantizer assignment half of [[ivfTopK]]: every vector
    * cosine-ranked against the broadcast centroid set. `crk = 1` rows
    * are the cell assignment (the INDEX — te17 persists exactly this,
    * cell-partitioned); `crk <= nprobe` rows of a query subset are its
    * probe list.
    */
  private[graft] def ivfRanked(vecs: DataFrame, idCol: String,
                               vecCol: String, nlist: Int): DataFrame = {
    val e = prepped(vecs, idCol, vecCol)
    ivfAssignPrepped(e, e.filter(col("id") < nlist)
      .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cn")))
  }

  /** The `nlist` lowest-id vectors of this frame as a frozen quantizer
    * (cid, cv, cn) — the centroid pick [[ivfRanked]] hardcodes,
    * exposed so an INCREMENTAL index build can keep assigning new
    * batches against the ORIGINAL centroids (te19): an IVF quantizer
    * is frozen at build time, growth happens inside cells.
    */
  def ivfCentroids(vecs: DataFrame, idCol: String, vecCol: String,
                   nlist: Int): DataFrame =
    prepped(vecs, idCol, vecCol).orderBy(col("id")).limit(nlist)
      .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))

  /** Cosine-rank `vecs` against an explicit frozen centroid frame —
    * crk = 1 rows are the cell assignment to append to a stored index,
    * crk <= nprobe rows of a query batch are its probe list. The
    * centroid frame is broadcast; the batch is never reshuffled.
    */
  def ivfAssign(vecs: DataFrame, idCol: String, vecCol: String,
                cent: DataFrame): DataFrame =
    ivfAssignPrepped(prepped(vecs, idCol, vecCol), cent)

  private def ivfAssignPrepped(e: DataFrame, cent: DataFrame): DataFrame = {
    val wAssign = Window.partitionBy(col("id"))
      .orderBy(col("cosc").desc, col("cid"))
    e.crossJoin(broadcast(cent))
      .withColumn("cosc", round(
        scaledToDouble(dot_scaled(col("v"), col("cv"))) / (col("nrm") * col("cn")), 6))
      .select(col("id"), col("v"), col("nrm"), col("cid"), col("cosc"))
      .withColumn("crk", row_number().over(wAssign))
  }

  /** The serving half of [[ivfTopK]]: broadcast probe list joined
    * against the cell-keyed index (`vec_id`, `cell`, `cv2`, `cn2`),
    * exact re-rank inside probed cells. When the index side is a
    * cell-PARTITIONED parquet store, the broadcast join on the
    * partition column lets dynamic partition pruning skip every
    * unprobed cell's files — the corpus isn't even read.
    */
  private[graft] def ivfServe(cells: DataFrame, probes: DataFrame,
                              k: Int): DataFrame = {
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(probes).join(cells, Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(
        scaledToDouble(dot_scaled(col("qv"), col("cv2"))) / (col("qn") * col("cn2")), 6))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cell"), col("cos"), col("rk"))
  }

  /** IVF with a FITTED coarse quantizer: `lloydIters` deterministic
    * Lloyd iterations (init = first `nlist` vectors, assignment =
    * argmax rounded cosine with cell-id tie-break, update = per-dim
    * exact-decimal mean), then the te05-style probe + exact re-rank.
    * Everything — including the k-means fit — is bit-reproducible by
    * the DuckDB oracle because sums are exact (decimal / scaled-long)
    * and ties are broken on ids.
    *
    * Centroids live on the DRIVER between rounds (nlist×dims doubles —
    * tiny), exactly like Spark MLlib's KMeans: each assignment round is
    * a broadcast map-only pass over the vectors instead of an N×nlist
    * shuffle-join blowup, and each update round is one shuffle of the
    * exploded index. The closure replicates the exploded-form
    * expressions bit for bit (floor-scaled long dots, HALF_UP
    * round(.,6), cell-id tie-breaks), so results are unchanged — the
    * oracle gate checks this at sf0.01.
    */
  /** Deterministic Lloyd fit shared by [[ivfKmeansTopK]] and
    * [[prototypePrune]] (one definition — drift between a search
    * quantizer and a pruning quantizer fitted "the same way" would be
    * invisible until cluster audits disagree). Seeds from the first
    * `nlist` vectors, runs `lloydIters` exact-decimal mean updates,
    * and returns (varr, scoredCells): varr = (id, arr, vn) assignment
    * input; scoredCells = the final (id, cell, cosc) cross frame —
    * one codegen'd DotScaledLong loop per (vector, centroid) against
    * the broadcast centroid frame + HALF_UP round(.,6), identical
    * arithmetic to the exploded SQL form. Centroids live on the
    * driver between rounds: nlist × dim doubles, KB-scale at any
    * corpus size — the corpus itself only ever streams through the
    * scoring and mean aggregates.
    */
  private def lloydFit(vecs: DataFrame, idCol: String, vecCol: String,
                       nlist: Int, lloydIters: Int): (DataFrame, DataFrame) = {
    val s = vecs.sparkSession
    val parallelism = s.sparkContext.defaultParallelism
    val ex = explodeVec(vecs, idCol, vecCol, "id").repartition(parallelism)
      .barrier() // feeds the mean update of every Lloyd round
    val nrm = norms(vecs, idCol, vecCol, "id").withColumnRenamed("nrm", "vn")
    // (id, arr, vn) — the map-side assignment input.
    val varr = vecs.select(col(idCol).as("id"), toDouble(col(vecCol)).as("arr"))
      .join(nrm, "id").repartition(parallelism).barrier()

    // Same arithmetic as scaledSum(x*mx), driver side.
    def centroidNorm(c: Array[Double]): Double =
      math.sqrt(c.map(v => math.floor(v * v * 1e12).toLong).sum.toDouble / 1e12)
    def scoredCells(cents: Array[(Long, Array[Double], Double)]): DataFrame = {
      val centDf = s.createDataFrame(
        cents.toSeq.map { case (cell, c, cn) => (cell, c.toSeq, cn) })
        .toDF("cell", "cv", "cn")
      varr.crossJoin(broadcast(centDf))
        .withColumn("cosc", round(
          scaledToDouble(dot_scaled(col("arr"), col("cv"))) / (col("vn") * col("cn")), 6))
    }

    var cents: Array[(Long, Array[Double], Double)] =
      vecs.where(col(idCol) < nlist)
        .select(col(idCol).cast("long").as("cell"), toDouble(col(vecCol)).as("arr"))
        .collect().map { r =>
          val c = r.getSeq[Double](1).toArray
          (r.getLong(0), c, centroidNorm(c))
        }.sortBy(_._1)

    var iter = 0
    while (iter < lloydIters) {
      // argmax(cosc desc, cell asc) folded into a partial-aggregable
      // max(struct) — map-side combine instead of a window sort.
      val cells = scoredCells(cents)
        .groupBy(col("id"))
        .agg(max(struct(col("cosc"), (-col("cell")).as("nc"))).as("best"))
        .select(col("id"), (-col("best.nc")).as("cell"))
      // exact-decimal per-dimension mean — deterministic in any
      // aggregation order, reproducible in SQL; empty cells drop out.
      cents = ex.join(cells, "id")
        .groupBy(col("cell"), col("d"))
        .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(25, 6)))
          .cast("double") / count(lit(1))).as("mx"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cell, rows) =>
          val dims = rows.map(r => r.getInt(1) -> r.getDouble(2)).toMap
          val c = Array.tabulate(dims.size)(dims)
          (cell, c, centroidNorm(c))
        }.toArray.sortBy(_._1)
      iter += 1
    }
    (varr, scoredCells(cents))
  }

  def ivfKmeansTopK(vecs: DataFrame, idCol: String, vecCol: String,
                    isQuery: Column => Column, nlist: Int, nprobe: Int,
                    k: Int, lloydIters: Int): DataFrame = {
    val (varr, scored) = lloydFit(vecs, idCol, vecCol, nlist, lloydIters)

    // Final assignment + probe list: rank cells best-first (cosc desc,
    // cell asc — same ordering as te05's window), keep only the nprobe
    // best per vector, materialize once for both consumers. Ranking is
    // a partial-aggregable collect_list + sort_array over the ≤nlist
    // co-located cell scores per vector — no N×nlist shuffle+sort (the
    // struct sorts by cosc desc then -cell desc = cell asc).
    val ranked = scored
      .groupBy(col("id"))
      .agg(slice(sort_array(collect_list(
          struct(col("cosc"), (-col("cell")).as("nc"))), asc = false),
        1, math.max(nprobe, 1)).as("best"))
      .select(col("id"), posexplode(col("best")).as(Seq("p", "b")))
      .select(col("id"), (-col("b.nc")).as("cell"), (col("p") + 1).as("crk"))
      .barrier() // feeds both the cell map and the probe list
    val cells = ranked.where(col("crk") === 1).select(col("id"), col("cell"))
    val probes = ranked.where(isQuery(col("id")) && col("crk") <= nprobe)
      .select(col("id").as("query_id"), col("cell"))
    val cand = broadcast(probes)
      .join(cells.select(col("id").as("vec_id"), col("cell")), Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
    // Exact re-rank inside the probed cells: one codegen'd DotScaledLong
    // loop per candidate pair on the full arrays (te05's form) — same
    // floor-scaled-long arithmetic as the exploded sum, without two
    // dim-exploded joins and a 64× groupBy.
    val qv = varr.where(isQuery(col("id"))).select(col("id").as("query_id"),
      col("arr").as("qarr"), col("vn").as("qn"))
    val cv = varr.select(col("id").as("vec_id"),
      col("arr").as("carr"), col("vn").as("cn2"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand
      .join(broadcast(qv), "query_id")
      .join(cv, "vec_id")
      .withColumn("cos", round(
        scaledToDouble(dot_scaled(col("qarr"), col("carr"))) / (col("qn") * col("cn2")), 6))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cell"), col("cos"), col("rk"))
  }

  /** Cluster-quota diversity pruning (the embedding-space data-pruning
    * family: SemDeDup's cluster pass, Sorscher et al. NeurIPS'22
    * prototypicality ranking, DCLM-style cluster-balanced subsets):
    * fit [[lloydFit]]'s deterministic k-means, rank each cluster's
    * members by cosine to their OWN centroid (most prototypical
    * first, id tie-break), and keep at most `cap` per cluster — a
    * dominant mode (boilerplate-heavy crawl clusters) contributes the
    * same quota as a rare one, flattening the cluster-size
    * distribution instead of sampling proportional to it. Emits every
    * vector with its cell, prototype rank, rounded centroid cosine
    * and keep verdict, so downstream mixing can ALSO invert the rule
    * (keep the tail past `cap` — the hard-example regime when data is
    * abundant) without refitting.
    *
    * Scale anatomy: the fit is [[lloydFit]] (corpus × broadcast
    * centroid scoring per round, exact-decimal mean aggregate); the
    * rank is ONE window per cell — cells are the partition key, so
    * the sort is per-cell-sized, and a skewed cell bounds a task at
    * its own size (same exposure as the IVF serve path, handled there
    * and here by nlist sizing, not by an all-corpus sort).
    */
  def prototypePrune(vecs: DataFrame, idCol: String, vecCol: String,
                     nlist: Int, lloydIters: Int, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val (_, scored) = lloydFit(vecs, idCol, vecCol, nlist, lloydIters)
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("cos_centroid").desc, col("id"))
    bestAssignment(scored)
      .withColumnRenamed("cosc", "cos_centroid")
      .withColumn("crk", row_number().over(w).cast("long"))
      .withColumn("kept", col("crk") <= cap)
      .select(col("id"), col("cell"), col("cos_centroid"), col("crk"),
        col("kept"))
  }

  /** Final (id, cell, cosc) winner of [[lloydFit]]'s scored cross
    * frame — argmax(cosc desc, cell asc) folded into a partial-
    * aggregable max(struct), the same ordering as the oracle's
    * row_number window. One definition for every consumer of the
    * fitted assignment (prune, gate, reindex).
    */
  private def bestAssignment(scored: DataFrame): DataFrame =
    scored
      .groupBy(col("id"))
      .agg(max(struct(col("cosc"), (-col("cell")).as("nc"))).as("best"))
      .select(col("id"), (-col("best.nc")).as("cell"),
        col("best.cosc").as("cosc"))

  /** Stale-index gate (te36): the reindex DECISION for a serving IVF
    * index, made from its own persisted artifacts. The fitted
    * assignment (id → cell) is written ONCE at fit time — the
    * persisted-index shape te17 serves from — and when the corpus
    * churns (here: `isLive` marks the rows still in the corpus), the
    * gate compares each cell's fit-time occupancy share against its
    * live share and ranks cells by the shift: the top-`topK` are the
    * refit budget's worklist ([[partialReindex]] executes it). Both
    * counts come from the SAME stored frame — the gate never rescans
    * or rescores the corpus, the td59/te34 persisted-baseline
    * discipline applied to index maintenance.
    *
    * Scale anatomy: fit = [[lloydFit]]; the store write/read is one
    * (id, cell) frame; the gate itself is two grouped counts on the
    * store and a window over the ≤nlist-row rollup. needs_reindex is
    * a RANK cut, not an absolute threshold — a refit budget holds at
    * any corpus size, where a fixed share threshold goes vacuous as
    * sampling noise shrinks.
    */
  def staleIndexGate(vecs: DataFrame, idCol: String, vecCol: String,
                     store: String, isLive: Column => Column,
                     nlist: Int, lloydIters: Int, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val s = vecs.sparkSession
    val (_, scored) = lloydFit(vecs, idCol, vecCol, nlist, lloydIters)
    bestAssignment(scored).select(col("id"), col("cell"))
      .write.mode("overwrite").parquet(store)
    gateFromAssign(s.read.parquet(store), isLive, topK)
  }

  /** The occupancy-shift rollup of [[staleIndexGate]], factored so
    * [[partialReindex]] gates from the same definition: per stored
    * cell, fit-time vs live counts and shares (floor'd micros over
    * the window totals of the ≤nlist-row frame), absolute shift, and
    * the rank cut.
    */
  private def gateFromAssign(assign: DataFrame, isLive: Column => Column,
                             topK: Int): DataFrame = {
    val fitc = assign.groupBy(col("cell")).agg(count(lit(1)).as("n_fit"))
    val livec = assign.where(isLive(col("id")))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_live"))
    val wAll = Window.rowsBetween(Long.MinValue, Long.MaxValue)
    val wRank = Window.orderBy(col("shift_micro").desc, col("cell"))
    fitc.join(livec, Seq("cell"), "left")
      .withColumn("n_live", coalesce(col("n_live"), lit(0L)))
      .withColumn("__tf", sum(col("n_fit")).over(wAll))
      .withColumn("__tl", sum(col("n_live")).over(wAll))
      .withColumn("fit_share_micro", expr("(n_fit * 1000000) DIV __tf"))
      .withColumn("live_share_micro",
        when(col("__tl") > 0L, expr("(n_live * 1000000) DIV __tl"))
          .otherwise(0L))
      .withColumn("shift_micro",
        abs(col("fit_share_micro") - col("live_share_micro")))
      .withColumn("reindex_rank", row_number().over(wRank).cast("long"))
      .withColumn("needs_reindex", col("reindex_rank") <= topK)
      .select(col("cell"), col("n_fit"), col("n_live"),
        col("fit_share_micro"), col("live_share_micro"),
        col("shift_micro"), col("reindex_rank"), col("needs_reindex"))
  }

  /** Budgeted partial reindex (te37): EXECUTE [[staleIndexGate]]'s
    * worklist without touching the healthy cells — the top-`topK`
    * drifted cells' LIVE members are split under two sub-seeds (the
    * cell's two smallest live ids — deterministic, the PQ/IVF seeding
    * convention), each member assigned to its nearer sub-seed by the
    * engine's exact rounded cosine. The rest of the index is never
    * read, rescored, or rewritten: refit cost is proportional to the
    * drifted slice, not the corpus — the same never-rewrite-the-store
    * economics as te30's tombstones, applied to refitting.
    *
    * Scale anatomy: gate as [[gateFromAssign]]; members = one
    * broadcast semi-join of the stored assignment against the ≤topK
    * flagged cells; scoring joins each member to ≤2 seed vectors
    * (broadcast — topK×2 rows) for one codegen'd DotScaledLong each.
    */
  def partialReindex(vecs: DataFrame, idCol: String, vecCol: String,
                     store: String, isLive: Column => Column,
                     nlist: Int, lloydIters: Int, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val s = vecs.sparkSession
    val (varr, scored) = lloydFit(vecs, idCol, vecCol, nlist, lloydIters)
    bestAssignment(scored).select(col("id"), col("cell"))
      .write.mode("overwrite").parquet(store)
    val assign = s.read.parquet(store)
    val flagged = gateFromAssign(assign, isLive, topK)
      .where(col("needs_reindex")).select(col("cell"))
    val members = assign.where(isLive(col("id")))
      .join(broadcast(flagged), Seq("cell"))
    val wSeed = Window.partitionBy(col("cell")).orderBy(col("id"))
    val seeds = members
      .withColumn("__srk", row_number().over(wSeed))
      .where(col("__srk") <= 2)
      .select(col("cell"), col("id").as("seed_id"))
      .join(varr.select(col("id").as("seed_id"), col("arr").as("sv"),
        col("vn").as("sn")), "seed_id")
    members
      .join(varr, "id")
      .join(broadcast(seeds), "cell")
      .withColumn("subcos", round(
        scaledToDouble(dot_scaled(col("arr"), col("sv")))
          / (col("vn") * col("sn")), 6))
      .groupBy(col("id"), col("cell"))
      .agg(max(struct(col("subcos"), (-col("seed_id")).as("ns"))).as("b"))
      .select(col("id"), col("cell"), (-col("b.ns")).as("sub_seed"),
        col("b.subcos").as("subcos"))
  }

  /** IVF nlist sizing audit (te38): the third leg of the pre-run
    * tuner family (LSH banding → classifier threshold → index
    * geometry) — BEFORE committing an IVF index's cell count for a
    * corpus-scale serving deployment, fit each candidate `nlist` and
    * report the numbers the serving cost model actually needs: how
    * many cells survived the fit (empty cells drop out of Lloyd),
    * the balance factor mean/max (a 1e6-micro load-balance score —
    * the per-cell window/task skew exposure te35/te36 bound by nlist
    * sizing is THIS number), and the worst-case probed fraction at
    * nprobe=2 (the two largest cells' share — what an adversarial
    * query pays). One row per candidate.
    *
    * Scale anatomy: one [[lloydFit]] per candidate (corpus ×
    * broadcast-centroid scoring; candidates are a handful); each
    * rollup reduces the fitted assignment to a ≤nlist-row cell-size
    * frame and then to ONE row — the union of a handful of one-row
    * plans, not a per-item driver loop.
    */
  def ivfNlistTuning(vecs: DataFrame, idCol: String, vecCol: String,
                     nlists: Seq[Int], lloydIters: Int): DataFrame = {
    require(nlists.nonEmpty && nlists.forall(_ >= 2),
      s"nlists must be >= 2, got $nlists")
    nlists.map { nl =>
      val (_, scored) = lloydFit(vecs, idCol, vecCol, nl, lloydIters)
      bestAssignment(scored)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_total"),
          max(col("n")).as("max_cell"),
          slice(sort_array(collect_list(col("n")), asc = false), 1, 2)
            .as("__top2"))
        .select(lit(nl.toLong).as("nlist"), col("n_cells"),
          col("n_total"), col("max_cell"),
          expr("(n_total * 1000000) DIV (n_cells * max_cell)")
            .as("balance_micro"),
          expr("(aggregate(__top2, CAST(0 AS BIGINT), (a, x) -> a + x)" +
            " * 1000000) DIV n_total").as("top2_share_micro"))
    }.reduce(_ unionByName _)
  }

  /** PQ (product quantization) ANN: split each vector into `dim/subDim`
    * subvectors; per subspace, quantize to the nearest of `nCent`
    * centroids (first `nCent` vectors' subvectors — deterministic,
    * oracle-checkable; a production fit would k-means each subspace
    * with the identical plan). Queries are scored by ADC (asymmetric
    * distance): the query's exact dot against every (subspace,
    * centroid) forms a tiny broadcast lookup table, and a candidate's
    * score is the sum of table entries selected by its codes — the
    * corpus is ranked from `dim/subDim`-byte codes alone, never
    * touching the full vectors at scoring time. That is the 100 TB
    * memory-compression path: the scoring input shrinks by ~subDim ×
    * sizeof(float) per code. Exact scaled-long sums and cid tie-breaks
    * keep every step bit-reproducible.
    */
  def pqTopK(vecs: DataFrame, idCol: String, vecCol: String,
             isQuery: Column => Column, subDim: Int, nCent: Int,
             k: Int): DataFrame = {
    val sx = pqSubExplode(vecs, idCol, vecCol, subDim)
    val cent = sx.filter(col("vec_id") < nCent)
      .select(col("vec_id").as("cid"), col("sub").as("csub"),
        col("dd").as("cdd"), col("x").as("cx"))
    val adot = pqAdot(sx, cent)
      .barrier() // feeds codes + the query ADC table
    val qdot = adot.where(isQuery(col("vec_id")))
      .select(col("vec_id").as("query_id"), col("sub").as("qsub"),
        col("cid"), col("dt"))
    pqServe(pqArgmaxCodes(adot), qdot, k)
  }

  /** (vec_id, sub, dd, x) — the sub-vector explode PQ stages share. */
  private[graft] def pqSubExplode(vecs: DataFrame, idCol: String,
                                  vecCol: String, subDim: Int): DataFrame = {
    val parallelism = vecs.sparkSession.sparkContext.defaultParallelism
    explodeVec(vecs, idCol, vecCol, "vec_id")
      .select(col("vec_id"), expr(s"d DIV $subDim").cast("int").as("sub"),
        (col("d") % subDim).as("dd"), col("x"))
      .repartition(parallelism)
  }

  /** Per-(vector, sub, centroid) scaled sub-dot against a BROADCAST
    * codebook frame (cid, csub, cdd, cx). On the corpus it feeds the
    * code argmax; on a query batch it IS the ADC lookup table.
    */
  private[graft] def pqAdot(sx: DataFrame, cent: DataFrame): DataFrame =
    sx.join(broadcast(cent),
        col("sub") === col("csub") && col("dd") === col("cdd"))
      .groupBy(col("vec_id"), col("sub"), col("cid"))
      .agg(sum(floor(col("x") * col("cx") * lit(1e12)).cast("long")).as("dt"))

  /** Nearest-centroid code per (vector, sub) — the stored PQ index. */
  private[graft] def pqArgmaxCodes(adot: DataFrame): DataFrame = {
    val wA = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("dt").desc, col("cid"))
    adot.withColumn("rk", row_number().over(wA))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("sub"), col("cid").as("code"))
  }

  /** ADC serving over a (possibly STORED) code table: the broadcast
    * query ADC tables join the codes on (sub, code) and the per-pair
    * score is one integer sum — the corpus's floats are never read at
    * query time, which is the point of a persisted PQ index (te22).
    */
  private[graft] def pqServe(codes: DataFrame, qdot: DataFrame,
                             k: Int): DataFrame = {
    val scored = codes.join(broadcast(qdot),
        col("sub") === col("qsub") && col("code") === col("cid"))
      .where(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg((sum(col("dt")).cast("double") / lit(1e12)).as("score"))
    val wT = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(wT)).where(col("rk") <= k)
      .select(col("query_id"), col("vec_id"),
        round(col("score"), 6).as("score"), col("rk"))
  }

  /** IVF+PQ ANN — the full FAISS IndexIVFPQ composition and the
    * 100 TB serving path: coarse IVF cells prune the corpus to the
    * query's `nprobe` cells, PQ-ADC scores ONLY those cells' codes
    * into a `shortlist`, and the shortlist re-ranks exactly. Where
    * [[pqTopK]] ADC-scans the whole code table per query batch (linear
    * in corpus — measured in SCALE.md), this scans nprobe/nlist of it;
    * the exact math touches queries × shortlist rows only. All three
    * stages keep their scale anatomy: centroids broadcast (KBs), the
    * corpus-sized sides never reshuffle except one id-keyed argmax
    * per stage, candidates flow through keyed equi-joins. The
    * deterministic centroid choices (first `nlist` vectors, first
    * `nCent` subvectors) make every stage oracle-checkable; a
    * production fit swaps in sampled k-means with the same plan.
    */
  def ivfPqTopK(vecs: DataFrame, idCol: String, vecCol: String,
                isQuery: Column => Column, nlist: Int, nprobe: Int,
                subDim: Int, nCent: Int, shortlist: Int, k: Int): DataFrame = {
    val parallelism = vecs.sparkSession.sparkContext.defaultParallelism
    // IVF assignment (te05 form); e feeds centroids, assignment AND the
    // exact re-rank arrays — materialize once.
    val e = prepped(vecs, idCol, vecCol).barrier()
    val cent = e.filter(col("id") < nlist)
      .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    val wAssign = Window.partitionBy(col("id"))
      .orderBy(col("cosc").desc, col("cid"))
    val ranked = e.crossJoin(broadcast(cent))
      .withColumn("cosc", round(
        scaledToDouble(dot_scaled(col("v"), col("cv"))) / (col("nrm") * col("cn")), 6))
      .select(col("id"), col("cid"), col("cosc"))
      .withColumn("crk", row_number().over(wAssign))
      .select(col("id"), col("cid"), col("crk"))
      .barrier() // feeds cells + probes
    val cells = ranked.where(col("crk") === 1)
      .select(col("id").as("vec_id"), col("cid").as("cell"))
    val probes = ranked.where(isQuery(col("id")) && col("crk") <= nprobe)
      .select(col("id").as("query_id"), col("cid").as("cell"))
    // PQ codes + the query ADC table (te07 form)
    val sx = explodeVec(vecs, idCol, vecCol, "vec_id")
      .select(col("vec_id"), expr(s"d DIV $subDim").cast("int").as("sub"),
        (col("d") % subDim).as("dd"), col("x"))
      .repartition(parallelism)
    val pqc = sx.filter(col("vec_id") < nCent)
      .select(col("vec_id").as("cid"), col("sub").as("csub"),
        col("dd").as("cdd"), col("x").as("cx"))
    val adot = sx.join(broadcast(pqc),
        col("sub") === col("csub") && col("dd") === col("cdd"))
      .groupBy(col("vec_id"), col("sub"), col("cid"))
      .agg(sum(floor(col("x") * col("cx") * lit(1e12)).cast("long")).as("dt"))
      .barrier() // feeds codes + the query ADC table
    val wA = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("dt").desc, col("cid"))
    val codes = adot.withColumn("rk", row_number().over(wA))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("sub"), col("cid").as("code"))
    val qd = adot.where(isQuery(col("vec_id")))
      .select(col("vec_id").as("qid"), col("sub").as("qsub"),
        col("cid"), col("dt"))
    // candidates = probed cells only; ADC scores just their codes
    val pairs = broadcast(probes).join(cells, Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
    val adcScores = pairs.join(codes, "vec_id")
      .join(broadcast(qd), col("query_id") === col("qid") &&
        col("sub") === col("qsub") && col("code") === col("cid"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg((sum(col("dt")).cast("double") / lit(1e12)).as("score"))
    val wS = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    val sl = adcScores.withColumn("srk", row_number().over(wS))
      .where(col("srk") <= shortlist)
      .select(col("query_id"), col("vec_id"))
    // exact re-rank of the shortlist (te08 form)
    val q = e.where(isQuery(col("id")))
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("id").as("vec_id"), col("v").as("cv2"), col("nrm").as("cn2"))
    val wT = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    sl.join(broadcast(q), "query_id").join(c, "vec_id")
      .withColumn("cos", round(
        scaledToDouble(dot_scaled(col("qv"), col("cv2"))) / (col("qn") * col("cn2")), 6))
      .withColumn("rk", row_number().over(wT)).where(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rk"))
  }

  /** Two-stage ANN: PQ-ADC shortlist (cheap, codes-only) then EXACT
    * cosine re-rank of just the shortlist pairs — the standard
    * refine-after-prefilter pattern (FAISS IndexIVFPQ + refine). At
    * 100 TB the exact arithmetic touches only queries × shortlist
    * rows, never the corpus pair space; the shortlist join is a keyed
    * equi-join on the corpus id.
    */
  def pqRerankTopK(vecs: DataFrame, idCol: String, vecCol: String,
                   isQuery: Column => Column, subDim: Int, nCent: Int,
                   shortlist: Int, k: Int): DataFrame = {
    val cand = pqTopK(vecs, idCol, vecCol, isQuery, subDim, nCent, shortlist)
      .select(col("query_id"), col("vec_id"))
    val p = prepped(vecs, idCol, vecCol)
    val q = p.select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = p.select(col("id").as("vec_id"), col("v").as("cv"), col("nrm").as("cn"))
    val scored = cand.join(broadcast(q), "query_id").join(c, "vec_id")
      .withColumn("cos", round(
        scaledToDouble(dot_scaled(col("qv"), col("cv"))) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rk"))
  }

  /** Exact top-k neighbors per query vector (pair join + native dot).
    * O(queries × corpus); corpora above [[ExactBaselineMaxRows]] must
    * opt in via forceExact — use ivfTopK/pqTopK at scale.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int,
                     forceExact: Boolean = false): DataFrame = {
    guardExact("bruteForceTopK", corpus, forceExact, "ivfTopK/pqTopK")
    val q = prepped(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = prepped(corpus, idCol, vecCol)
      .select(col("id").as("vec_id"), col("v").as("cv"), col("nrm").as("cn"))
    val scored = q.join(broadcast(c), col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(
        scaledToDouble(dot_scaled(col("qv"), col("cv"))) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rk"))
  }

  /** Sign-random-projection bucket id (nbits hyperplanes, ±1 components
    * from a multiplicative hash of (bit, dim) — data-independent,
    * deterministic, and reproducible in plain SQL). Vectors in the same
    * bucket are cosine-close with high probability; probe hamming-1
    * neighbor buckets for higher recall. This is the 100 TB path: join
    * on bucket instead of all-pairs. One codegen'd loop per row
    * (SrpBucketLong) — the earlier nbits×dim expression forest spent
    * its time in codegen compilation and interpreted fallback.
    */
  def srpBucket(vec: Column, nbits: Int): Column =
    graft.functions.VectorExpressions.srp_bucket(toDouble(vec), nbits)

  /** The probe list for a query bucket: the bucket itself plus its
    * `nbits` hamming-1 neighbors (multi-probe LSH — recall without
    * paying for more tables).
    */
  def srpProbes(bucket: Column, nbits: Int): Column =
    array(bucket +: (0 until nbits).map(b =>
      bucket.bitwiseXOR(lit(1L << b))): _*)

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    * embeddings with a coarse quantizer, compare pairs ONLY within a
    * (leaf) cluster, connect pairs above the cosine threshold into
    * duplicate groups, and keep the minimum id of each group as
    * canonical. Returns (id, cell, rep_id, keep) for every vector.
    *
    * Scale anatomy — the whole point of SemDeDup over all-pairs: the
    * pairwise stage is an equi-join on the cell id, O(Σ|cell|²) instead
    * of O(n²), distributed by cell. A FIXED nlist is n^1.5 in disguise
    * (nlist≈√n keeps E|cell|=√n, so Σ|cell|² ≈ n·√n — and the n×nlist
    * assignment pass is n^1.5 too; measured 33.6× time at 100× data),
    * so cells are refined HIERARCHICALLY instead: any cell above
    * `cellCap` rows is re-quantized against `fanout` second-level
    * centroids (members stride-sampled by id-rank across the cell —
    * as deterministic as the coarse pick, but covering the cell),
    * recursively until every leaf fits or `maxDepth` is hit. Pair work is then O(n·cellCap) and
    * assignment O(n·(nlist + fanout·depth)) — both corpus-linear —
    * while cells at or under the cap are BIT-IDENTICAL to the
    * single-level quantizer's (splitting only touches oversized
    * cells). Leaf ids compose collision-free as
    * (parent+1)·max(fanout,nlist)+subIdx; ids strictly grow with
    * depth. maxDepth bounds the pathological all-identical-vectors
    * cell (it cannot split — every member lands in one sub-cell).
    *
    * Centroids are the first `nlist` vectors (deterministic,
    * oracle-checkable); a fitted quantizer drops in via the
    * [[ivfKmeansTopK]] Lloyd fit with the identical downstream plan.
    * Component labeling uses the cell-confined one-pass union-find
    * ([[Dedup.componentsWithinGroups]]) — edges cannot span leaf
    * cells, so no iterative label propagation is needed. The oversized
    * cell-id list broadcast per round is ≤ n/cellCap ids (KB–MB at any
    * realistic scale).
    */
  def semanticDedup(vecs: DataFrame, idCol: String, vecCol: String,
                    nlist: Int, threshold: Double, cellCap: Int = 4096,
                    fanout: Int = 16, maxDepth: Int = 8): DataFrame = {
    val e = prepped(vecs, idCol, vecCol)
    val cent = e.filter(col("id") < nlist)
      .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    val wAssign = Window.partitionBy(col("id"))
      .orderBy(col("cosc").desc, col("cid"))
    var cells = e.crossJoin(broadcast(cent))
      .withColumn("cosc", round(
        scaledToDouble(dot_scaled(col("v"), col("cv"))) / (col("nrm") * col("cn")), 6))
      .withColumn("crk", row_number().over(wAssign))
      .where(col("crk") === 1)
      .select(col("id"), col("cid").as("cell"), col("v"), col("nrm"))
      .barrier() // feeds size probe / split rounds / pair join / output
    val step = math.max(fanout, nlist).toLong
    var depth = 0
    var splitting = true
    while (splitting && depth < maxDepth) {
      val over = cells.groupBy(col("cell"))
        .agg(count(lit(1)).as("__cn"))
        .where(col("__cn") > cellCap)
      if (over.limit(1).count() == 0) splitting = false
      else {
        val tagged = cells.join(broadcast(over), Seq("cell"), "left")
        val okRows = tagged.where(col("__cn").isNull)
          .select(col("id"), col("cell"), col("v"), col("nrm"))
        val overRows = tagged.where(col("__cn").isNotNull)
          .select(col("id"), col("cell"), col("v"), col("nrm"), col("__cn"))
        // Second-level centroids: fanout members STRIDE-SAMPLED by
        // id-rank across each oversized cell (rank 1, 1+⌈cn/fanout⌉,
        // …) — deterministic like the coarse min-id pick, but covers
        // the whole cell even when ids correlate with geometry (the
        // fanout lowest ids alone can huddle in one corner and leave a
        // leaf that re-splits dozens of rounds without shrinking).
        val wSub = Window.partitionBy(col("cell")).orderBy(col("id"))
        val strideCol = ((col("__cn") + lit(fanout - 1)) / lit(fanout))
          .cast("long")
        val subCent = overRows
          .withColumn("__rn", row_number().over(wSub))
          .withColumn("__stride", strideCol)
          .where(((col("__rn") - 1) % col("__stride")) === 0)
          .select(col("cell"),
            ((col("__rn") - 1) / col("__stride")).cast("long").as("sub"),
            col("v").as("cv"), col("nrm").as("cn"))
        val wReassign = Window.partitionBy(col("id"))
          .orderBy(col("cosc").desc, col("sub"))
        val splitRows = overRows.join(subCent, Seq("cell"))
          .withColumn("cosc", round(
            scaledToDouble(dot_scaled(col("v"), col("cv"))) / (col("nrm") * col("cn")), 6))
          .withColumn("crk", row_number().over(wReassign))
          .where(col("crk") === 1)
          .select(col("id"),
            ((col("cell") + 1) * step + col("sub")).as("cell"),
            col("v"), col("nrm"))
        cells = okRows.union(splitRows).barrier()
        depth += 1
      }
    }
    val a = cells.select(col("cell"), col("id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = cells.select(col("cell"), col("id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val pairs = a.join(b, Seq("cell")).where(col("id_a") < col("id_b"))
      .withColumn("cos", round(
        scaledToDouble(dot_scaled(col("va"), col("vb"))) / (col("na") * col("nb")), 6))
      .where(col("cos") >= threshold)
      .select(col("cell"), col("id_a"), col("id_b"))
    // Edges are cell-confined, so labeling is one shuffle + per-cell
    // union-find — no iterative driver loop.
    val comps = Dedup.componentsWithinGroups(pairs, "cell")
    cells.select(col("id"), col("cell"))
      .join(comps, Seq("id"), "left")
      .select(col("id").as(idCol), col("cell"),
        coalesce(col("label"), col("id")).as("rep_id"))
      .withColumn("keep", col(idCol) === col("rep_id"))
  }

  /** Embedding-outlier detection against the corpus centroid — the
    * noise-filtering step of an embedding pipeline (mislabeled /
    * off-distribution vectors sit far from the mass): one exact
    * aggregate computes the per-dimension centroid (floor-scaled long
    * sums, so the mean is order-independent and oracle-reproducible),
    * every vector is scored by cosine against the broadcast
    * 64-double centroid in a map-side pass, and the outlier flag cuts
    * BELOW the corpus floor-mean score by integer comparison (the
    * td23 selection pattern — scale-independent, non-vacuous). Scale
    * anatomy: two aggregates + one stateless scan; the corpus never
    * reshuffles and nothing driver-side grows with it.
    */
  def centroidOutliers(vecs: DataFrame, idCol: String, vecCol: String,
                       dim: Int = 64): DataFrame = {
    val e = prepped(vecs, idCol, vecCol).barrier()
    val dimSums = (0 until dim).map(d =>
      sum(floor(element_at(col("v"), d + 1) * lit(1e12)).cast("long")).as(s"s$d"))
    val sums = e.agg(count(lit(1)).as("n"), dimSums: _*).collect()(0)
    val n = sums.getLong(0)
    val c = Array.tabulate(dim)(d => (sums.getLong(d + 1).toDouble / 1e12) / n)
    val cNorm = math.sqrt(
      c.map(x => math.floor(x * x * 1e12).toLong).sum.toDouble / 1e12)
    val cCol = array(c.map(lit(_)): _*)
    val scored = e.select(col("id"),
      floor(scaledToDouble(dot_scaled(col("v"), cCol)) /
        (col("nrm") * lit(cNorm)) * lit(1e6)).cast("long").as("__s6"))
    val tot = scored.agg(sum(col("__s6")).as("__tot"), count(lit(1)).as("__n"))
    // floor(tot/n), not integer `div`: cosines (hence tot) can be
    // negative, where Spark's div truncates but the oracle's floor
    // division floors — floor of the double quotient agrees everywhere.
    scored.crossJoin(broadcast(tot))
      .select(col("id"), (col("__s6") / lit(1e6)).as("cos_centroid"),
        (col("__s6") < floor(col("__tot") / col("__n"))).as("outlier"))
  }

  /** Approximate k-NN GRAPH over the whole corpus (every node, not a
    * query subset): SRP-bucket the vectors, generate candidates by a
    * self-equi-join on the bucket id, score candidates with the exact
    * codegen'd dot, keep each node's top-k, and flag MUTUAL edges (i is
    * in j's top-k and j in i's) — the reciprocal-neighbor signal that
    * seeds graph clustering and diversity filtering. Scale anatomy:
    * candidate work is O(Σ|bucket|²) distributed by bucket (pick nbits
    * so the expected bucket stays small), top-k is a per-node window
    * over candidates only, and the mutuality pass is a keyed self-join
    * of the k·n edge list — no stage touches the n² pair space.
    */
  def knnGraph(vecs: DataFrame, idCol: String, vecCol: String,
               nbits: Int, k: Int): DataFrame = {
    val e = prepped(vecs, idCol, vecCol)
      .withColumn("bucket", srpBucket(col("v"), nbits))
      .barrier() // both sides of the bucket join + nothing else
    val a = e.select(col("bucket"), col("id"),
      col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("bucket"), col("id").as("nb_id"),
      col("v").as("vb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("id")).orderBy(col("cos").desc, col("nb_id"))
    val knn = a.join(b, Seq("bucket")).where(col("id") =!= col("nb_id"))
      .withColumn("cos", round(
        scaledToDouble(dot_scaled(col("va"), col("vb"))) / (col("na") * col("nb")), 6))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("id"), col("nb_id"), col("cos"), col("rk"))
      .barrier() // feeds both sides of the mutuality join
    val rev = knn.select(col("nb_id").as("id"), col("id").as("nb_id"),
      lit(true).as("__m"))
    knn.join(rev, Seq("id", "nb_id"), "left")
      .select(col("id"), col("nb_id"), col("cos"), col("rk"),
        coalesce(col("__m"), lit(false)).as("mutual"))
  }

  /** te31: embedding-space decontamination against a held-out eval
    * set — flags every train vector whose cosine to ANY eval vector
    * reaches `threshold` (the SemDeDup-style complement of the n-gram
    * decontamination in TextOps: paraphrased leakage that shares no
    * n-gram still lands next to the benchmark in embedding space).
    * The eval split here is `id % evalMod == 0` — a stand-in for a
    * FIXED benchmark set, which is what makes the scale shape honest:
    * a real eval set is bounded (~1e4 rows at any corpus size), so it
    * broadcasts and the train side streams through ONE corpus-linear
    * pass with no shuffle at all; per-row cost is |eval| × dim
    * codegen'd scaled-long dots. Guarded like the other exact
    * baselines, but on the BROADCAST side only (the train side may be
    * the whole corpus); if the eval set outgrows the guard, prune
    * with the IVF path (te05/te18) instead. Exact scaled-long dots +
    * HALF_UP rounding keep the threshold decision
    * engine-reproducible.
    */
  def evalContamination(vecs: DataFrame, idCol: String, vecCol: String,
                        evalMod: Int, threshold: Double,
                        forceExact: Boolean = false): DataFrame = {
    // prepped()'s round-robin exchange is kept DELIBERATELY: it is a
    // materialization barrier, not a parallelism fix — without it the
    // train side's float→double transform and norm are re-inlined
    // into the pair loop and evaluated |eval| times per row (measured
    // 1.9 → 13.5 s at the 100× probe tier). Paying corpus bytes once
    // beats 3× CPU on the |eval| × corpus dot loop for any real
    // benchmark size.
    val n = prepped(vecs, idCol, vecCol)
    val ev = n.where(col("id") % evalMod === 0)
      .select(col("id").as("eval_id"), col("v").as("ev"), col("nrm").as("en"))
    guardExact("evalContamination", ev, forceExact,
      "ivfTopK with the eval set as the probe side")
    val tr = n.where(col("id") % evalMod =!= 0)
      .select(col("id").as("train_id"), col("v").as("tv"), col("nrm").as("tn"))
    tr.join(broadcast(ev), lit(true))
      .withColumn("cos", round(
        scaledToDouble(dot_scaled(col("tv"), col("ev"))) / (col("tn") * col("en")), 6))
      .where(col("cos") >= threshold)
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("cos")).as("best_cos"))
  }

  /** te32: [[evalContamination]]'s IVF-pruned twin — the path its
    * guard names when the eval set outgrows the broadcast budget. The
    * TRAIN corpus is the IVF index (crk = 1 cell assignment — te17's
    * persistable layout); each EVAL vector probes its `nprobe` nearest
    * cells, so only ~nprobe/nlist of the corpus is dotted against any
    * eval vector instead of all of it. Same output schema as the
    * exact op, so diffing the two IS the recall measurement
    * (contaminating pairs whose cell wasn't probed are the misses).
    * Probing all cells (nprobe = nlist) reproduces the exact result —
    * pinned in TextOpsSpec.
    */
  def ivfEvalContamination(vecs: DataFrame, idCol: String, vecCol: String,
                           evalMod: Int, threshold: Double,
                           nlist: Int, nprobe: Int): DataFrame = {
    val ranked = ivfRanked(vecs, idCol, vecCol, nlist)
    val cells = ranked.where(col("crk") === 1 && col("id") % evalMod =!= 0)
      .select(col("id").as("train_id"), col("cid").as("ccell"),
        col("v").as("tv"), col("nrm").as("tn"))
    val probes = ranked.where(col("id") % evalMod === 0 && col("crk") <= nprobe)
      .select(col("id").as("eval_id"), col("cid").as("cell"),
        col("v").as("ev"), col("nrm").as("en"))
    // No broadcast hint, deliberately: this op is the escape path for
    // eval sets too big to broadcast (evalContamination's guard), so
    // the probe⋈cell join must survive a huge probe side — it's an
    // EQUALITY join on the cell id, so Catalyst broadcasts the probes
    // while they're small and falls back to a cell-keyed shuffle hash
    // join when they aren't, which is exactly the stored-index layout
    // (te17 partitions by cell).
    probes
      .join(cells, col("cell") === col("ccell"))
      .withColumn("cos", round(
        scaledToDouble(dot_scaled(col("ev"), col("tv"))) / (col("en") * col("tn")), 6))
      .where(col("cos") >= threshold)
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("cos")).as("best_cos"))
  }
}
