package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 training-data/retrieval additions: late-interaction
  * (MaxSim) re-ranking, MMR diversity re-ranking, and
  * temperature-based language mixture weights — the serving-quality
  * and data-mixing stages that sit downstream of the dedup/ANN core.
  */
object PipelineExt2 extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Late-interaction (ColBERT MaxSim) re-rank: first-stage top-20
    // cosine candidates re-scored token-wise — per query token, the
    // best candidate-token micro-cosine, summed. Tokens are the 8
    // contiguous 8-dim sub-vectors of each embedding (a documented
    // stand-in; the testdata has one vector per doc). The token-pair
    // max/sum runs inside ONE codegen'd expression per candidate
    // (MaxSimMicroLong) — nothing token-scale is shuffled.
    "te23_maxsim_rerank" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val cand = VectorOps.bruteForceTopK(
          emb.filter(col("vec_id") % 25 === 0), emb, "vec_id", "embedding", 20)
        .select(col("query_id"), col("vec_id"))
      RetrievalOps.maxSimRerank(emb, "vec_id", "embedding", cand,
          tokenDim = 8, k = 3)
        .orderBy("query_id", "rk")
    },

    // MMR diversity re-rank: greedy λ=0.7 selection of 5 from the
    // top-10 cosine candidates per query, exact integer objective
    // (mmr10 = 7·rel_micro − 3·max selected sim_micro).
    "te24_mmr_rerank" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val cand = VectorOps.bruteForceTopK(
          emb.filter(col("vec_id") % 25 === 0), emb, "vec_id", "embedding", 10)
        .select(col("query_id"), col("vec_id"))
      RetrievalOps.mmrRerank(emb, "vec_id", "embedding", cand, kSel = 5)
        .orderBy("query_id", "step")
    },

    // Hard-negative mining (te27): for each anchor, the top-3 most
    // cosine-similar vectors with a DIFFERENT label — the negatives a
    // contrastive embedding trainer wants (similar yet wrong). The
    // exact pair scan is the GUARDED baseline (hardNegativesTopK —
    // te02's shape plus the label-inequality gate, refuses >100k rows);
    // at corpus scale VectorOps.ivfHardNegatives answers the same
    // query with the label inequality in the ANN probe join, exactly
    // like te18's attribute filter (probe row in SCALE.md).
    "te27_hard_negatives" -> { (s, dir) =>
      VectorOps.hardNegativesTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", "label", _ % 25 === 0, k = 3)
        .orderBy("query_id", "rk")
    },

    // Temperature-based language mixture weights (multilingual LM
    // sampling, α = 0.5): w ∝ n_tokens^α, kept exact by scaling
    // sqrt(n_tokens) to an integer BEFORE the normalizing sum, then
    // integer division — low-resource languages get boosted relative
    // to their raw token share (raw_micro vs w_micro). One tiny
    // aggregate per language; corpus scanned once, map-side token
    // counts.
    "td38_temperature_mix" -> { (s, dir) =>
      val per = Tables.load(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextOps.words(col("text"))).cast("long")).as("n_tokens"))
        .withColumn("s_scaled",
          floor(sqrt(col("n_tokens").cast("double")) * lit(1e6)).cast("long"))
      val tot = per.agg(sum(col("s_scaled")).as("tot_s"),
        sum(col("n_tokens")).as("tot_t"))
      per.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          // microRatio, not a bare multiply: tot_t is the CORPUS token
          // count — at 100 TB, n_tokens·1e6 overflows (ANSI: throws)
          CurationOps.microRatio("n_tokens", "tot_t").as("raw_micro"),
          CurationOps.microRatio("s_scaled", "tot_s").as("w_micro"))
        .orderBy("lang")
    },

    // Training-shard manifest (td39): WebDataset/Megatron-style export
    // bookkeeping — every doc deterministically hashed into one of 16
    // shards (td28's multiplicative hash, replayable in SQL), and the
    // per-shard manifest a training job's data loader reads: doc/token/
    // char totals + language spread. One map-side hash + one 16-group
    // aggregate; corpus scanned once — the balance columns are what a
    // 100 TB export audits before burning GPU hours on skewed shards.
    "td39_shard_manifest" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("shard", CurationOps.shardOf(col("doc_id"), 16))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextOps.words(col("text"))).cast("long")).as("n_tokens"),
          sum(length(col("text")).cast("long")).as("n_chars"),
          countDistinct(col("lang")).as("n_langs"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy("shard")
    },

    // Embedding centroid drift (te25): the corpus-QA monitor that
    // compares per-label centroids between two snapshots (halves by
    // vec_id parity here — in production, yesterday's corpus vs
    // today's): cosine between the MEAN vectors per label, exact via
    // the repo's floor-scaled arithmetic (component sums accumulated
    // as scaled longs, means divided deterministically, dot/norms
    // floor-scaled again). Means (not raw sums) keep every
    // intermediate bounded regardless of corpus size. Two aggregates
    // over the exploded index + one |labels|×64 join — corpus never
    // reshuffled on anything wider than (label, half, dim).
    "te25_centroid_drift" -> { (s, dir) =>
      val ex = Tables.load(s, dir, "embeddings")
        .select(col("label"), (col("vec_id") % 2).as("half"),
          posexplode(VectorOps.toDouble(col("embedding"))).as(Seq("d", "x")))
      // both halves' sums in ONE conditional aggregate per (label, d) —
      // no self-join (a filtered self-join here is a second shuffle and
      // a lineage-dedup trap), then the label rollup
      val m = ex.groupBy(col("label"), col("d"))
        .agg(
          sum(when(col("half") === 0, floor(col("x") * lit(1e6)).cast("long"))
            .otherwise(0L)).as("sxa"),
          sum(when(col("half") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("half") === 1, floor(col("x") * lit(1e6)).cast("long"))
            .otherwise(0L)).as("sxb"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("nb"))
        .withColumn("ma", col("sxa").cast("double") / lit(1e6) / col("na"))
        .withColumn("mb", col("sxb").cast("double") / lit(1e6) / col("nb"))
      m.groupBy(col("label"))
        .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
          sum(floor(col("ma") * col("mb") * lit(1e12)).cast("long")).as("dotl"),
          sum(floor(col("ma") * col("ma") * lit(1e12)).cast("long")).as("nal"),
          sum(floor(col("mb") * col("mb") * lit(1e12)).cast("long")).as("nbl"))
        .select(col("label"), col("n_a"), col("n_b"),
          floor((col("dotl").cast("double") / lit(1e12))
            / (sqrt(col("nal").cast("double") / lit(1e12))
              * sqrt(col("nbl").cast("double") / lit(1e12)))
            * lit(1e6)).cast("long").as("drift_micro"))
        .orderBy("label")
    }
  )

  /** Shared DuckDB CTE prefix: exploded dims, norms, and the %25
    * brute-force candidate ranking (the te02 skeleton).
    */
  private def candSql(k: Int): String = s"""
      ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               CAST(sum(CAST(floor((q.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex q JOIN ex c ON q.d = c.d
        WHERE q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id
        GROUP BY 1, 2),
      cand AS (
        SELECT query_id, vec_id, dot FROM (
          SELECT dots.query_id, dots.vec_id, dot,
                 row_number() OVER (PARTITION BY dots.query_id
                   ORDER BY round(dot / (nq.nrm * nc.nrm), 6) DESC, dots.vec_id) AS rn
          FROM dots JOIN norms nq ON dots.query_id = nq.vec_id
                    JOIN norms nc ON dots.vec_id = nc.vec_id)
        WHERE rn <= $k)"""

  /** MMR greedy unrolled into one CTE layer per step (sel1..selK) —
    * recursive CTEs can't reference the recursive table twice (once
    * for the exclusion, once for the penalty max), so the fixed step
    * count is generated instead.
    */
  private def mmrOracle(kSel: Int): String = {
    val steps = (2 to kSel).map { n =>
      val prev = n - 1
      s"""
      pen$n AS (
        SELECT r.query_id, r.vec_id, r.rel, max(p.sim) AS mx
        FROM rel r
        LEFT JOIN selu$prev excl ON excl.query_id = r.query_id AND excl.vec_id = r.vec_id
        JOIN selu$prev sl ON sl.query_id = r.query_id
        JOIN pairsym p ON p.query_id = r.query_id AND p.a = r.vec_id AND p.b = sl.vec_id
        WHERE excl.vec_id IS NULL
        GROUP BY 1, 2, 3),
      sel$n AS (
        SELECT query_id, vec_id, s FROM (
          SELECT query_id, vec_id, 7 * rel - 3 * mx AS s,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY 7 * rel - 3 * mx DESC, vec_id) AS rn
          FROM pen$n) WHERE rn = 1),
      selu$n AS (SELECT * FROM selu$prev
                 UNION ALL SELECT query_id, vec_id FROM sel$n)"""
    }.mkString(",")
    val finalUnion = (1 to kSel).map { n =>
      s"SELECT query_id, CAST($n AS INT) AS step, vec_id, CAST(s AS BIGINT) AS mmr10 FROM sel$n"
    }.mkString("\n      UNION ALL ")
    s"""
      WITH ${candSql(10)},
      rel AS (
        SELECT c.query_id, c.vec_id,
               CAST(floor(c.dot / (nq.nrm * nc.nrm) * 1e6) AS BIGINT) AS rel
        FROM cand c JOIN norms nq ON nq.vec_id = c.query_id
                    JOIN norms nc ON nc.vec_id = c.vec_id),
      pdots AS (
        SELECT c1.query_id, c1.vec_id AS a, c2.vec_id AS b,
               CAST(sum(CAST(floor((ea.x * eb.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM cand c1 JOIN cand c2
               ON c1.query_id = c2.query_id AND c1.vec_id <> c2.vec_id
             JOIN ex ea ON ea.vec_id = c1.vec_id
             JOIN ex eb ON eb.vec_id = c2.vec_id AND eb.d = ea.d
        GROUP BY 1, 2, 3),
      pairsym AS (
        SELECT p.query_id, p.a, p.b,
               CAST(floor(p.dot / (na.nrm * nb.nrm) * 1e6) AS BIGINT) AS sim
        FROM pdots p JOIN norms na ON na.vec_id = p.a
                     JOIN norms nb ON nb.vec_id = p.b),
      sel1 AS (
        SELECT query_id, vec_id, 7 * rel AS s FROM (
          SELECT query_id, vec_id, rel,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY 7 * rel DESC, vec_id) AS rn
          FROM rel) WHERE rn = 1),
      selu1 AS (SELECT query_id, vec_id FROM sel1),$steps
      $finalUnion
      ORDER BY query_id, step"""
  }

  override def oracleSql: Map[String, String] = Map(
    "te23_maxsim_rerank" -> s"""
      WITH ${candSql(20)},
      tok AS (
        SELECT vec_id, CAST(t AS INT) AS t,
               list_transform(embedding[t*8+1 : t*8+8], v -> CAST(v AS DOUBLE)) AS tv
        FROM embeddings, unnest(range(0, 8)) AS u(t)),
      vt AS (
        SELECT * FROM (
          SELECT vec_id, t, tv,
                 sqrt(CAST(CAST(list_sum(list_transform(range(1, 9),
                   i -> CAST(floor(tv[i] * tv[i] * 1e12) AS BIGINT))) AS BIGINT) AS DOUBLE) / 1e12) AS tn
          FROM tok)
        WHERE tn > 0),
      pair AS (
        SELECT c.query_id, c.vec_id, q.t AS qt,
               max(CAST(floor(
                 CAST(CAST(list_sum(list_transform(range(1, 9),
                   i -> CAST(floor(q.tv[i] * e.tv[i] * 1e12) AS BIGINT))) AS BIGINT) AS DOUBLE) / 1e12
                 / (q.tn * e.tn) * 1e6) AS BIGINT)) AS best
        FROM cand c JOIN vt q ON q.vec_id = c.query_id
                    JOIN vt e ON e.vec_id = c.vec_id
        GROUP BY 1, 2, 3),
      score AS (
        SELECT query_id, vec_id, CAST(sum(best) AS BIGINT) AS score_micro
        FROM pair GROUP BY 1, 2)
      SELECT query_id, vec_id, score_micro, rk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY score_micro DESC, vec_id) AS INT) AS rk
        FROM score)
      WHERE rk <= 3
      ORDER BY query_id, rk""",

    "te24_mmr_rerank" -> mmrOracle(5),

    "te27_hard_negatives" -> """
      WITH ex AS (
        SELECT vec_id, label, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      dots AS (
        SELECT q.vec_id AS query_id, q.label AS qlabel,
               c.vec_id AS vec_id, c.label AS label,
               CAST(sum(CAST(floor((q.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex q JOIN ex c ON q.d = c.d
        WHERE q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id
              AND q.label <> c.label
        GROUP BY 1, 2, 3, 4),
      scored AS (
        SELECT query_id, qlabel, dots.vec_id AS vec_id, label,
               round(dot / (nq.nrm * nc.nrm), 6) AS cos
        FROM dots JOIN norms nq ON dots.query_id = nq.vec_id
                  JOIN norms nc ON dots.vec_id = nc.vec_id)
      SELECT query_id, qlabel, vec_id, label, cos, rk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, vec_id) AS INT) AS rk
        FROM scored)
      WHERE rk <= 3
      ORDER BY query_id, rk""",

    "td39_shard_manifest" -> """
      SELECT CAST((doc_id * 2654435761) % 1000000007 % 16 AS INT) AS shard,
             count(1) AS n_docs,
             CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens,
             CAST(sum(length(text)) AS BIGINT) AS n_chars,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             min(doc_id) AS min_doc, max(doc_id) AS max_doc
      FROM documents
      GROUP BY 1
      ORDER BY shard""",

    "te25_centroid_drift" -> """
      WITH ex AS (
        SELECT label, vec_id % 2 AS half, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      sums AS (
        SELECT label, half, d,
               CAST(sum(CAST(floor(x * 1e6) AS BIGINT)) AS BIGINT) AS sx,
               count(1) AS n
        FROM ex GROUP BY 1, 2, 3),
      m AS (SELECT label, half, d, CAST(sx AS DOUBLE) / 1e6 / n AS m, n FROM sums),
      j AS (
        SELECT a.label, a.d, a.m AS ma, b.m AS mb, a.n AS na, b.n AS nb
        FROM m a JOIN m b ON a.label = b.label AND a.d = b.d
        WHERE a.half = 0 AND b.half = 1)
      SELECT label, CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
             CAST(floor(
               (CAST(sum(CAST(floor(ma * mb * 1e12) AS BIGINT)) AS DOUBLE) / 1e12)
               / (sqrt(CAST(sum(CAST(floor(ma * ma * 1e12) AS BIGINT)) AS DOUBLE) / 1e12)
                 * sqrt(CAST(sum(CAST(floor(mb * mb * 1e12) AS BIGINT)) AS DOUBLE) / 1e12))
               * 1e6) AS BIGINT) AS drift_micro
      FROM j GROUP BY label
      ORDER BY label""",

    "td38_temperature_mix" -> """
      WITH per AS (
        SELECT lang, count(1) AS n_docs,
               CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang),
      scaled AS (
        SELECT lang, n_docs, n_tokens,
               CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS s_scaled
        FROM per),
      tot AS (
        SELECT CAST(sum(s_scaled) AS BIGINT) AS tot_s,
               CAST(sum(n_tokens) AS BIGINT) AS tot_t
        FROM scaled)
      SELECT lang, n_docs, n_tokens,
             (n_tokens * 1000000) // tot_t AS raw_micro,
             (s_scaled * 1000000) // tot_s AS w_micro
      FROM scaled, tot
      ORDER BY lang"""
  )
}
