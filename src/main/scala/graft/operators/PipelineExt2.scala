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
          expr("(n_tokens * 1000000) DIV tot_t").as("raw_micro"),
          expr("(s_scaled * 1000000) DIV tot_s").as("w_micro"))
        .orderBy("lang")
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
