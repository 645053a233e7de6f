package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Checkpoints.BarrierOps

/** Text-retrieval and corpus-curation primitives a training-data
  * pipeline needs beyond dedup: BM25 lexical top-k retrieval, int8
  * embedding quantization (the storage path for 100 TB vector
  * corpora), sliding-window token chunking, and exact-quota
  * stratified sampling via a distributed hash histogram.
  *
  * Everything follows the repo's bit-exact oracle contract: no
  * transcendental functions in scored paths (Java `Math.log` and
  * DuckDB `ln` are not guaranteed to agree in the last ulp), all
  * order-dependent float sums accumulated as floor-scaled longs, all
  * rounding via `floor(x + 0.5)` (identical in both engines, unlike
  * HALF_UP decimal rounding).
  */
object RetrievalOps {

  /** BM25 top-k lexical retrieval (k1 = 1.2, b = 0.75) with a
    * RATIONAL idf — `(N - df + 0.5) / (df + 0.5)` without the log.
    * The log is a monotone per-term transform; dropping it keeps every
    * arithmetic step an IEEE-exact +,-,*,/ chain that DuckDB replays
    * bit-for-bit (same reason td20's DSIR selection is log-free).
    * Semantics parity: the tf-saturation and length-normalization
    * terms are exactly Robertson's; ranking differs from log-idf BM25
    * only when a multi-term score trades a high-df term against a
    * low-df one at 1e-6 resolution.
    *
    * Scale shape: the corpus token index is pruned by a broadcast
    * semi-join against the (tiny) query-term list BEFORE any
    * aggregation, so tf/df aggregates touch only matching postings —
    * the corpus is scanned once and never reshuffled on anything
    * wider than (doc_id, term) for surviving terms. Document frequency
    * is corpus-global (counted on the pruned posting list, which
    * retains every posting of a query term). Global N and Σdl are a
    * two-scalar aggregate broadcast via crossJoin. Top-k per query is
    * a window over (query, doc) partials — queries are few by
    * construction, docs per query bounded by postings of its terms.
    *
    * @param docs      corpus with an id and a text column
    * @param queryPred picks the query docs (e.g. doc_id % 400 === 0)
    * @param nTerms    first-N words of a query doc form its term set
    * @param k         results per query
    * @return (query_id, doc_id, score, rk) — score is the floor-scaled
    *         (1e6) BM25 sum as a double
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryPred: Column => Column, nTerms: Int, k: Int): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
        TextOps.words(col(textCol)).as("w"))
      .withColumn("dl", size(col("w")).cast("long"))
    val qterms = base.filter(queryPred(col("doc_id")))
      .select(col("doc_id").as("query_id"),
        explode(slice(col("w"), 1, nTerms)).as("term"))
      .distinct()
    val perDoc = bm25PerDoc(base, qterms)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    perDoc.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rk"))
  }

  /** BM25 hard-negative mining — te27's lexical sibling: for each
    * query doc, the top-k BM25-scoring docs whose `labelCol` DIFFERS
    * from the query's (the "similar text, wrong group" negatives a
    * retrieval/embedding trainer mines from its own corpus; for
    * dense-retriever training, "BM25 negatives" is the standard
    * recipe — Karpukhin et al. 2020 §4.2). Scoring is exactly
    * `bm25TopK`'s rational-idf floor-scaled contract; the label gate
    * sits on the scored (query, doc) partial-aggregate frame — i.e.
    * AFTER the broadcast term-list pruning but BEFORE the top-k
    * window, so a query never loses negatives to same-label docs
    * crowding the cutoff, and nothing corpus-sized is ever joined on
    * more than (term) / (doc_id). The self-pair is excluded by the
    * gate for free (a doc shares its own label).
    *
    * @return (query_id, doc_id, score, rk)
    */
  def bm25Negatives(docs: DataFrame, idCol: String, textCol: String,
                    labelCol: String, queryPred: Column => Column,
                    nTerms: Int, k: Int): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
        col(labelCol).as("lbl"), TextOps.words(col(textCol)).as("w"))
      .withColumn("dl", size(col("w")).cast("long"))
    val qterms = base.filter(queryPred(col("doc_id")))
      .select(col("doc_id").as("query_id"), col("lbl").as("qlbl"),
        explode(slice(col("w"), 1, nTerms)).as("term"))
      .distinct()
    val perDoc = bm25PerDoc(base, qterms, extraKeys = Seq("qlbl"))
    // the hard-negative gate: different label only (excludes self too)
    val gated = perDoc
      .join(base.select(col("doc_id"), col("lbl")), Seq("doc_id"))
      .where(col("lbl") =!= col("qlbl"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    gated.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rk"))
  }

  /** The shared BM25 scoring core of [[bm25TopK]] / [[bm25Negatives]] /
    * [[rm3TopK]]: floor-scaled per-(query, doc) partial sums over the
    * posting list pruned by the broadcast query-term list. `base` must
    * carry (doc_id, w, dl); `qterms` carries (query_id, term) plus any
    * `extraKeys` that should survive the final groupBy. The corpus is
    * scanned once and never reshuffled on anything wider than
    * (doc_id, term) for surviving terms; df is corpus-global per term
    * (the pruned posting list keeps every posting of a listed term).
    */
  private def bm25PerDoc(base: DataFrame, qterms: DataFrame,
                         extraKeys: Seq[String] = Nil,
                         statsOpt: Option[DataFrame] = None): DataFrame = {
    val toks = base.select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
    val termList = qterms.select("term").distinct()
    // prune postings before aggregating: corpus-linear, map-side gate
    val tf = toks.join(broadcast(termList), Seq("term"))
      .groupBy(col("doc_id"), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // the (n_docs, sum_dl) aggregate is a full corpus scan (it
    // re-splits every document's text to size `w`); callers scoring
    // the SAME base twice (rm3TopK) pass it in pre-materialized
    val stats = statsOpt.getOrElse(
      base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")))
    val scored = tf.join(broadcast(dft), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("s",
        ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          ((col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(0.25) +
              lit(0.75) * ((col("dl") * col("n_docs")).cast("double") / col("sum_dl"))))))
    val keys = (Seq("query_id") ++ extraKeys :+ "doc_id").map(col)
    qterms.join(scored, Seq("term"))
      .groupBy(keys: _*)
      .agg((sum(floor(col("s") * lit(1e6)).cast("long")).cast("double") / lit(1e6))
        .as("score"))
  }

  /** RM3-style pseudo-relevance-feedback query expansion (Lavrenko &
    * Croft relevance models, the Anserini/Galago default, reduced to
    * the repo's exact-arithmetic contract): retrieve `fbDocs` feedback
    * docs with the original terms, mine the `fbTerms` most frequent
    * NEW terms from them (total term frequency across the feedback
    * set, ties by term — the linearized stand-in for RM3's
    * probability-weighted expansion), re-score with the expanded term
    * set, return the final top-k.
    *
    * Scale shape: two passes of the [[bm25PerDoc]] machinery — each
    * corpus-linear behind a broadcast term-list gate — plus one
    * broadcast semi-join of the (tiny) feedback list against the token
    * index for expansion mining. Queries stay few by construction;
    * nothing corpus-sized ever shuffles on more than (doc_id, term).
    *
    * @return (query_id, doc_id, score, rk) — score from the EXPANDED
    *         term set
    */
  def rm3TopK(docs: DataFrame, idCol: String, textCol: String,
              queryPred: Column => Column, nTerms: Int, fbDocs: Int,
              fbTerms: Int, k: Int): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
        TextOps.words(col(textCol)).as("w"))
      .withColumn("dl", size(col("w")).cast("long"))
    val q0 = base.filter(queryPred(col("doc_id")))
      .select(col("doc_id").as("query_id"),
        explode(slice(col("w"), 1, nTerms)).as("term"))
      .distinct()
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    // (n_docs, sum_dl) computed ONCE for both scoring passes — one
    // 1-row frame, materialized eagerly so the second pass's broadcast
    // reuses it instead of re-scanning (and re-word-splitting) the
    // corpus
    val stats = Some(base
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .barrier())
    val fb = bm25PerDoc(base, q0, statsOpt = stats)
      .withColumn("rk", row_number().over(wRank)).where(col("rk") <= fbDocs)
      .select(col("query_id"), col("doc_id"))
    // Mine expansion terms from the feedback docs only: broadcast-join
    // the (queries × fbDocs)-sized feedback list against base BEFORE
    // exploding, so the token explode multiplies a handful of rows, not
    // the corpus — the corpus-wide explodes stay confined to the two
    // BM25 scoring passes.
    val fbTok = base.join(broadcast(fb), Seq("doc_id"))
      .select(col("query_id"), explode(col("w")).as("term"))
      .groupBy(col("query_id"), col("term")).agg(count(lit(1)).as("tfsum"))
    val wExp = Window.partitionBy(col("query_id"))
      .orderBy(col("tfsum").desc, col("term"))
    val expTerms = fbTok.join(q0, Seq("query_id", "term"), "left_anti")
      .withColumn("erk", row_number().over(wExp)).where(col("erk") <= fbTerms)
      .select(col("query_id"), col("term"))
    val q1 = q0.unionByName(expTerms).distinct()
    bm25PerDoc(base, q1, statsOpt = stats)
      .withColumn("rk", row_number().over(wRank)).where(col("rk") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rk"))
  }

  /** Reciprocal-rank fusion of a lexical and a vector candidate list —
    * hybrid retrieval, the standard two-tower serving pattern. Each
    * list contributes `1e9 div (60 + rank)` (Cormack's RRF with k=60,
    * kept in exact integer division so both engines agree to the
    * digit); a doc absent from one list contributes 0 from it. The
    * two lists are joined full-outer on (query, doc) and re-ranked by
    * the fused score. Inputs are whatever top-k shape produced them —
    * at corpus scale the vector side comes from srpBucket/ivfTopK
    * instead of the brute-force baseline, same columns.
    *
    * @param lex (query_id, doc_id, rk) lexical ranks
    * @param vec (query_id, doc_id, rk) vector ranks
    * @param k   fused results per query
    * @return (query_id, doc_id, rrf, rk)
    */
  def rrfFuse(lex: DataFrame, vec: DataFrame, k: Int): DataFrame = {
    val l = lex.select(col("query_id"), col("doc_id"), col("rk").as("rk_lex"))
    val v = vec.select(col("query_id"), col("doc_id"), col("rk").as("rk_vec"))
    val fused = l.join(v, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(expr("1000000000 DIV (60 + rk_lex)"), lit(0L)) +
          coalesce(expr("1000000000 DIV (60 + rk_vec)"), lit(0L)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("query_id"), col("doc_id"), col("rrf"), col("rk"))
  }

  /** Symmetric per-vector int8 quantization — the storage/transport
    * format for embedding corpora (4x smaller than float32; PQ's
    * (te07) coarse cousin). scale = 127 / max|x|; code =
    * floor(x*scale + 0.5) (round-half-up, identical in both engines);
    * reconstruction error accumulated as floor-scaled (1e9) longs so
    * the sum is aggregation-order-free. Two aggregates over the
    * exploded (id, d, x) index, corpus never reshuffled on anything
    * but vec_id — linear and partial-agg friendly.
    *
    * @return (vec_id, maxabs, n_sat, n_dims, sae) where n_sat counts
    *         saturated codes (|code| = 127) and sae is the summed
    *         absolute reconstruction error
    */
  def int8Quantize(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val ex = vecs.select(col(idCol).as("vec_id"),
        posexplode(VectorOps.toDouble(col(vecCol))).as(Seq("d", "x")))
    val mx = ex.groupBy(col("vec_id")).agg(max(abs(col("x"))).as("maxabs"))
    ex.join(mx, Seq("vec_id"))
      .withColumn("scale",
        when(col("maxabs") === 0, lit(0.0)).otherwise(lit(127.0) / col("maxabs")))
      .withColumn("code", floor(col("x") * col("scale") + lit(0.5)).cast("long"))
      .withColumn("err",
        when(col("scale") === 0, lit(0.0))
          .otherwise(abs(col("x") - col("code") / col("scale"))))
      .groupBy(col("vec_id"))
      .agg(max(col("maxabs")).as("maxabs"),
        sum(when(abs(col("code")) === 127, 1L).otherwise(0L)).as("n_sat"),
        count(lit(1)).as("n_dims"),
        (sum(floor(col("err") * lit(1e9)).cast("long")).cast("double") / lit(1e9))
          .as("sae"))
  }

  /** Sliding-window token chunking with overlap: chunk i covers
    * tokens [i*stride, i*stride + size). The training-data prep step
    * that turns documents into fixed-budget sequences with context
    * overlap. Pure map-side (explode of a per-doc `sequence`), no
    * shuffle at all — each output row carries the chunk's md5 so
    * downstream exact-dedup (td01) composes without materializing
    * chunk text twice.
    *
    * @return (doc_id, chunk_id, start, n_tok, chunk_md5)
    */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size > 0, "size and stride must be positive")
    val base = docs.select(col(idCol).as("doc_id"),
        TextOps.words(col(textCol)).as("w"))
      .withColumn("dl", org.apache.spark.sql.functions.size(col("w")))
    base.select(col("doc_id"), col("w"),
        explode(sequence(lit(0), col("dl") - 1, lit(stride))).as("start"))
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        col("start").cast("long").as("start"),
        org.apache.spark.sql.functions.size(slice(col("w"), col("start") + 1, lit(size)))
          .cast("long").as("n_tok"),
        md5(array_join(slice(col("w"), col("start") + 1, lit(size)), " "))
          .as("chunk_md5"))
  }

  /** Exact-quota stratified sampling by deterministic hash order,
    * computed WITHOUT a per-stratum global sort. Selection rule: per
    * stratum, keep the `quota` docs with the smallest
    * (h, id) where h = (id * 2654435761) % 1000000007 — a fixed
    * multiplicative hash both engines evaluate exactly in BIGINT.
    *
    * At scale a per-stratum `row_number` window is a single-partition
    * sort of the whole stratum (strata are few and huge). Instead:
    * bucket h into 1024 h-ordered ranges, aggregate per-(stratum,
    * bucket) counts into a histogram (≤ |strata| x 1024 rows, fully
    * distributed — each stratum's ≤1024 buckets fit one window
    * partition), pick per stratum the boundary bucket where the
    * cumulative count crosses the quota via a cumulative-sum window,
    * broadcast the |strata|-row boundary frame back onto the corpus,
    * then take all docs below the boundary and rank ONLY inside the
    * boundary bucket (≈ stratum/1024 rows). The full stratum is never
    * sorted, NOTHING corpus- or histogram-scale ever reaches the
    * driver, and the stratum column keeps its native type end to end
    * (int buckets work as well as strings). The corpus is scanned
    * twice, shuffled once on the tiny histogram and once on the
    * boundary-bucket rows.
    *
    * @return (stratum, doc_id, h) — the selected sample
    */
  def stratifiedQuota(docs: DataFrame, idCol: String, strataCol: String,
                      quota: Int): DataFrame = {
    val HMod = 1000000007L
    val NBuckets = 1024L
    val bucketWidth = HMod / NBuckets + 1 // h-ordered ranges
    val hashed = docs.select(col(strataCol).as("stratum"),
        col(idCol).cast("long").as("doc_id"))
      .withColumn("h", (col("doc_id") * lit(2654435761L)) % lit(HMod))
      .withColumn("bucket", (col("h") / lit(bucketWidth)).cast("long"))
    // distributed histogram: ≤ |strata| x 1024 rows, never collected
    val hist = hashed.groupBy(col("stratum"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    // cumulative count of the buckets BEFORE each bucket, per stratum
    // (≤1024 rows per window partition — bounded by construction)
    val wCum = Window.partitionBy(col("stratum")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cum_before",
      coalesce(sum(col("cnt")).over(wCum), lit(0L)))
    // boundary = first bucket where the running total reaches the
    // quota; strata whose total is ≤ quota produce NO boundary row and
    // are kept whole via the left join below. |strata| rows out.
    val boundsDf = cum
      .where(col("cum_before") + col("cnt") >= quota.toLong)
      .groupBy(col("stratum"))
      .agg(min_by(
        struct(col("bucket").as("boundary"),
          (lit(quota.toLong) - col("cum_before")).as("from_boundary")),
        col("bucket")).as("bb"))
      .select(col("stratum"), col("bb.boundary").as("boundary"),
        col("bb.from_boundary").as("from_boundary"))
    val joined = hashed.join(broadcast(boundsDf), Seq("stratum"), "left")
    val below = joined.where(col("boundary").isNull ||
      col("bucket") < col("boundary"))
    val wB = Window.partitionBy(col("stratum")).orderBy(col("h"), col("doc_id"))
    val atBoundary = joined.where(col("bucket") === col("boundary"))
      .withColumn("rk", row_number().over(wB))
      .where(col("rk") <= col("from_boundary"))
    below.select(col("stratum"), col("doc_id"), col("h"))
      .unionAll(atBoundary.select(col("stratum"), col("doc_id"), col("h")))
  }

  import graft.functions.VectorExpressions.{dot_scaled, max_sim_micro}

  /** ColBERT-style late-interaction re-rank: a first-stage candidate
    * list is re-scored by MaxSim over per-token embeddings — for each
    * query token, the best-matching candidate token's micro-cosine,
    * summed (Khattab & Zaharia, SIGIR 2020). The testdata carries one
    * 64-dim vector per doc, so tokens are derived by viewing it as
    * `nTokens` contiguous sub-vectors (dim/nTokens each) — a loudly
    * documented stand-in with exactly the production plan shape: token
    * matrices live in ONE array column per row, and the whole
    * token-pair max/sum runs inside one codegen'd expression per
    * (query, candidate) pair (`MaxSimMicroLong`), so the pair frame
    * never explodes to token granularity and nothing token-scale is
    * ever shuffled. Candidates come from any first stage (here the
    * caller passes them in; at corpus scale that is ivfTopK/srpBucket);
    * re-rank cost is |candidates| tight loops.
    *
    * @param vecs     (id, vector) corpus
    * @param cand     (query_id, vec_id) first-stage candidates
    * @param tokenDim width of each contiguous token sub-vector
    * @param k        results per query
    * @return (query_id, vec_id, score_micro, rk)
    */
  def maxSimRerank(vecs: DataFrame, idCol: String, vecCol: String,
                   cand: DataFrame, tokenDim: Int, k: Int): DataFrame = {
    val v = vecs.select(col(idCol).as("vid"),
      VectorOps.toDouble(col(vecCol)).as("v"))
    val q = v.select(col("vid").as("query_id"), col("v").as("qv"))
    val c = v.select(col("vid").as("vec_id"), col("v").as("cv"))
    val scored = cand.join(q, Seq("query_id")).join(c, Seq("vec_id"))
      .withColumn("score_micro", max_sim_micro(col("qv"), col("cv"), tokenDim))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("score_micro"), col("rk"))
  }

  /** Maximal-Marginal-Relevance diversity re-rank (Carbonell &
    * Goldstein, SIGIR 1998): greedily select `kSel` of each query's
    * `cand` candidates maximizing
    * `λ·rel(q,d) − (1−λ)·max_{s∈selected} sim(d,s)` with λ = 0.7,
    * kept EXACT by integer arithmetic: relevance and pairwise
    * similarity are floor-scaled micro-cosines (BIGINT), and the MMR
    * objective is scaled by 10 (`mmr10 = 7·rel − 3·max_sim`), so both
    * engines agree to the digit. Step 1 has no penalty term
    * (`mmr10 = 7·rel`); ties break on the smaller vec_id.
    *
    * Scale shape: relevance needs one hash join of the candidate list
    * against the vector corpus; pairwise sims are |cand|² PER QUERY
    * (bounded by nCand, here ≤10 — never corpus-quadratic); the greedy
    * itself runs per query over ≤nCand items + sims collected into ONE
    * row (collect_list per query, bounded by construction), so the
    * sequential part is O(kSel·nCand) per query inside a mapped
    * Dataset — fully distributed across queries.
    *
    * @param vecs  (id, vector) corpus
    * @param cand  (query_id, vec_id) candidate lists (≤ a few dozen per query)
    * @param kSel  how many to select per query
    * @return (query_id, step, vec_id, mmr10) — step 1..kSel in selection order
    */
  def mmrRerank(vecs: DataFrame, idCol: String, vecCol: String,
                cand: DataFrame, kSel: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // prune the corpus to the vectors the re-rank actually touches
    // (queries + candidates — bounded by the candidate lists) BEFORE
    // materializing: without this the checkpoint is corpus-sized and
    // grows with scale even though the re-rank never reads it
    // (measured: 2.3 s → 7.3 s over 1×→100× un-pruned; flat pruned)
    val needed = cand.select(col("query_id").as("vid"))
      .unionAll(cand.select(col("vec_id").as("vid"))).distinct()
    val v = vecs.select(col(idCol).as("vid"),
        VectorOps.toDouble(col(vecCol)).as("v"))
      .join(broadcast(needed), Seq("vid"), "left_semi")
      .withColumn("nrm",
        sqrt(dot_scaled(col("v"), col("v")).cast("double") / lit(1e12)))
    // one materialization: v feeds the relevance join AND both sides
    // of the pairwise-sim join (three consumers of the same lambda-cast
    // frame — the localCheckpoint lesson from the salting probe)
    val vc = v.repartition(spark.sparkContext.defaultParallelism).barrier()
    val rel = cand
      .join(vc.select(col("vid").as("query_id"), col("v").as("qv"), col("nrm").as("qn")), "query_id")
      .join(vc.select(col("vid").as("vec_id"), col("v").as("cv"), col("nrm").as("cn")), "vec_id")
      .withColumn("rel_micro",
        floor(dot_scaled(col("qv"), col("cv")).cast("double") / lit(1e12)
          / (col("qn") * col("cn")) * lit(1e6)).cast("long"))
      .select(col("query_id"), col("vec_id"), col("rel_micro"))
    val c2 = cand.select(col("query_id"), col("vec_id").as("b"))
    val pairs = cand.select(col("query_id"), col("vec_id").as("a"))
      .join(c2, Seq("query_id")).where(col("a") =!= col("b"))
      .join(vc.select(col("vid").as("a"), col("v").as("av"), col("nrm").as("an")), "a")
      .join(vc.select(col("vid").as("b"), col("v").as("bv"), col("nrm").as("bn")), "b")
      .withColumn("sim_micro",
        floor(dot_scaled(col("av"), col("bv")).cast("double") / lit(1e12)
          / (col("an") * col("bn")) * lit(1e6)).cast("long"))
      .select(col("query_id"), col("a"), col("b"), col("sim_micro"))
    val items = rel.groupBy(col("query_id"))
      .agg(collect_list(struct(col("vec_id").as("_1"), col("rel_micro").as("_2"))).as("items"))
    val prs = pairs.groupBy(col("query_id"))
      .agg(collect_list(struct(col("a").as("_1"), col("b").as("_2"),
        col("sim_micro").as("_3"))).as("pairs"))
    items.join(prs, Seq("query_id"))
      .as[(Long, Seq[(Long, Long)], Seq[(Long, Long, Long)])]
      .flatMap { case (qid, its, prs) =>
        val sim = prs.map(p => (p._1, p._2) -> p._3).toMap
        val out = Seq.newBuilder[(Long, Int, Long, Long)]
        var selected = List.empty[Long]
        var remaining = its.sortBy(_._1).toList
        var step = 1
        while (step <= kSel && remaining.nonEmpty) {
          val scored = remaining.map { case (vid, rel) =>
            val s =
              if (selected.isEmpty) 7L * rel
              else 7L * rel - 3L * selected.map(sv => sim((vid, sv))).max
            (vid, s)
          }
          val (bestId, bestS) = scored.minBy { case (vid, s) => (-s, vid) }
          out += ((qid, step, bestId, bestS))
          selected ::= bestId
          remaining = remaining.filterNot(_._1 == bestId)
          step += 1
        }
        out.result()
      }
      .toDF("query_id", "step", "vec_id", "mmr10")
  }
}
