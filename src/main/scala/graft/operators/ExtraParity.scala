package graft.operators

import graft.{QueryModule, Tables}
import graft.cep.Nfa
import graft.cep.Nfa.{AfterMatch, Pattern, Quantifier, Step}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Checkpoints.BarrierOps

/** Additional inventory items: CEP OneOrMore quantifier (greedy looping
  * state — flink-cep Pattern.oneOrMore), URL/map scalar functions
  * (PARSE_URL, STR_TO_MAP — FlinkSqlOperatorTable), and batch
  * iterations (DataSet.iterate / IterativeDataSet parity, SURVEY §2.10)
  * as driver-looped label propagation producing near-dup connected
  * components.
  */
object ExtraParity extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CEP: one-or-more consecutive errors immediately followed by a view
    // (greedy OneOrMore + strict contiguity + within bound).
    "m03_cep_one_or_more" -> { (s, dir) =>
      import s.implicits._
      val ds = Tables.load(s, dir, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("tus"),
          col("user_id"), col("event_type")).as[Ev]
      val pat = Pattern[Ev](Vector(
        Step("e", (_: Ev).event_type == "error", quantifier = Quantifier.OneOrMore),
        Step("v", (_: Ev).event_type == "view")),
        withinMicros = Some(7200L * 1000000L),
        afterMatch = AfterMatch.SkipPastLast)
      ds.groupByKey(_.user_id)
        .flatMapGroups { (uid, it) =>
          val evs = it.toIndexedSeq.sortBy(e => (e.tus, e.event_id))
          Nfa.run[Ev](evs, _.tus, pat).iterator.map { m =>
            val errs = m.bindings.find(_._1 == "e").get._2
            (uid, errs.head.event_id, errs.size, m.first("v").event_id)
          }
        }
        .toDF("user_id", "first_err", "n_errs", "view_id")
        .orderBy("user_id", "first_err")
    },

    // PARSE_URL / STR_TO_MAP over constructed URLs.
    "f09_url_map" -> { (s, dir) =>
      Tables.load(s, dir, "customer")
        .withColumn("url", concat(lit("https://shop.example.com/c/"),
          col("c_custkey"), lit("?seg="), col("c_mktsegment"), lit("&v=1")))
        .withColumn("kv", concat(lit("seg:"), col("c_mktsegment"),
          lit(",key:"), col("c_custkey")))
        .select(col("c_custkey"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          parse_url(col("url"), lit("QUERY"), lit("seg")).as("seg_param"),
          str_to_map(col("kv"), lit(","), lit(":")).getItem("seg").as("seg_map"),
          str_to_map(col("kv"), lit(","), lit(":")).getItem("key").as("key_map"),
          size(map_keys(str_to_map(col("kv"), lit(","), lit(":")))).as("n_keys"))
        .orderBy("c_custkey")
    },

    // Batch iteration: connected components over the near-dup pair graph
    // (label propagation to a fixpoint; driver-side loop like the
    // reference's bulk iteration, per-iteration work fully distributed).
    "it01_connected_components" -> { (s, dir) =>
      val idx = TextOps.shingleHashIndex(Tables.load(s, dir, "documents"), "doc_id", "text", 3)
      val pairs = TextOps.allPairsJaccardIdx(idx, 0.8)
        .select(col("id_a"), col("id_b"))
      Dedup.connectedComponents(pairs).orderBy("id")
    },

    // Batch iteration #6: synchronous label propagation (3 rounds,
    // most-frequent neighbour label, min tie-break) over it01's
    // near-dup graph — the community-detection sibling of connected
    // components; with the fixed round count and deterministic ties
    // every round is replayed by the oracle's unrolled CTEs.
    "it06_label_propagation" -> { (s, dir) =>
      val idx = TextOps.shingleHashIndex(Tables.load(s, dir, "documents"), "doc_id", "text", 3)
      val pairs = TextOps.allPairsJaccardIdx(idx, 0.8)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      Pregel.labelPropagation(pairs, rounds = 3).orderBy("id")
    },

    // Batch iteration #2: PageRank (5 fixed rounds, damping 0.85) over
    // the customer→supplier order graph — the reference's DataSet bulk
    // iteration shape with a weighted-propagation body. Per-round work
    // is one edge join + one keyed aggregate, fully distributed; ranks
    // accumulate through floor-scaled longs so the DuckDB recursive-CTE
    // oracle reproduces every round bit for bit. (Simple non-normalized
    // variant: dangling-node mass leaks, identically in both engines.)
    "it02_pagerank" -> { (s, dir) =>
      val edges = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
        .distinct().barrier()
      val nodes = edges.select(col("src").as("n"))
        .union(edges.select(col("dst"))).distinct().barrier()
      // The degree is loop-invariant: weld it onto the edge list ONCE
      // so each round is one join + one aggregate instead of two joins.
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      val edgesDeg = edges.join(deg, "src").barrier()
      val cnt = nodes.count()
      var pr = nodes.withColumn("r", lit(1.0 / cnt))
      // The rounds stay LAZY: each references the previous round once,
      // so the composed plan is linear in rounds, runs as ONE job, and
      // Catalyst reuses the edgesDeg exchange across rounds instead of
      // re-materializing a checkpoint per round.
      for (_ <- 0 until 5) {
        val contrib = pr.join(edgesDeg, col("n") === col("src"))
          .groupBy(col("dst"))
          .agg((sum(floor((col("r") / col("d")) * 1e9).cast("long"))
            .cast("double") / 1e9).as("s"))
        pr = nodes.join(contrib, col("n") === col("dst"), "left")
          .select(col("n"),
            (lit(0.15 / cnt) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("r"))
      }
      pr.select(col("n").as("node"), round(col("r"), 9).as("rank")).orderBy("node")
    },

    // Batch iteration #3: the GENERAL vertex-centric API (Gelly
    // scatter-gather, reference flink-gelly
    // .../spargel/ScatterGatherIteration.java) instead of a hand-rolled
    // loop — fixed-round Bellman-Ford SSSP over the undirected
    // customer↔supplier order graph with deterministic integer weights
    // derived from the endpoint keys, source = minimum node id. Six
    // supersteps as ONE lazy linear plan; exact long arithmetic, so the
    // recursive-CTE oracle replays every round.
    "it03_sssp" -> { (s, dir) =>
      val base = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("a"), (col("l_suppkey") + 1000000L).as("b"))
        .distinct()
      // materialize the edge list ONCE: the min-source scan and every
      // superstep read the checkpointed frame instead of re-deriving
      // the orders⋈lineitem distinct per consumer
      val edges = base.select(col("a").as("src"), col("b").as("dst"))
        .union(base.select(col("b").as("src"), col("a").as("dst")))
        .withColumn("w", pmod(col("src") + col("dst"), lit(9)) + 1)
        .barrier()
      val nodes = edges.select(col("src").as("n")).distinct()
      val src0 = edges.agg(min(col("src"))).collect()(0).getLong(0)
      Pregel.sssp(nodes, edges, src0, rounds = 6)
        .where(col("attr") < Pregel.Unreached)
        .select(col("n").as("node"), col("attr").as("dist"))
        .orderBy("node")
    },

    // Batch iteration #5: DELTA iteration (flink-java
    // DeltaIteration.java — solution set + workset, early termination
    // when the workset empties). Converged SSSP over the it03 graph:
    // the workset holds only last-round-improved vertices, so settled
    // regions stop generating join work; a 20-round budget converges
    // well before the cap, and the fixed-20-round oracle equals the
    // converged fixpoint (post-convergence rounds are no-ops).
    "it05_sssp_delta" -> { (s, dir) =>
      val base = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("a"), (col("l_suppkey") + 1000000L).as("b"))
        .distinct()
      val edges = base.select(col("a").as("src"), col("b").as("dst"))
        .union(base.select(col("b").as("src"), col("a").as("dst")))
        .withColumn("w", pmod(col("src") + col("dst"), lit(9)) + 1)
        .barrier()
      val nodes = edges.select(col("src").as("n")).distinct()
      val src0 = edges.agg(min(col("src"))).collect()(0).getLong(0)
      Pregel.ssspDelta(nodes, edges, src0, rounds = 20)
        .where(col("attr") < Pregel.Unreached)
        .select(col("n").as("node"), col("attr").as("dist"))
        .orderBy("node")
    },

    // Graph parity #4: triangle enumeration (Gelly's
    // flink-libraries/flink-gelly/.../library/TriangleEnumerator.java)
    // over the top-8 co-supplier graph: per supplier, its 8 strongest
    // partners by shared-order count (ties by id), mutualized. The
    // raw "ever shared an order" graph goes COMPLETE as SF grows (all
    // supplier pairs eventually co-occur), which makes triangle count
    // cubic in suppliers by construction; the top-M graph is
    // degree-bounded, so the enumeration stays linear in suppliers at
    // every SF while still exercising the degree-ordered wedge kernel
    // (orient from lower-(degree, id) endpoint, wedge fan-out bounded
    // by the smaller endpoint degree, O(E^1.5)). Output: per-supplier
    // triangle membership counts.
    "it04_triangle_count" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      // count each unordered pair once (sk<sk join halves the pair
      // stream through the shuffle+aggregate), then mirror for the
      // per-supplier ranking — same counts, half the join volume
      val coHalf = li.as("x").join(li.as("y"), Seq("ok"))
        .where(col("x.sk") < col("y.sk"))
        .groupBy(col("x.sk").as("s"), col("y.sk").as("p"))
        .agg(count(lit(1)).as("c"))
      val co = coHalf.unionAll(
        coHalf.select(col("p").as("s"), col("s").as("p"), col("c")))
      val w = Window.partitionBy(col("s")).orderBy(col("c").desc, col("p"))
      val top = co.withColumn("rk", row_number().over(w)).where(col("rk") <= 8)
      val und = top.select(least(col("s"), col("p")).as("a"),
          greatest(col("s"), col("p")).as("b")).distinct()
      Pregel.triangleCounts(und).orderBy("supp")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "m03_cep_one_or_more" -> """
      WITH s AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events),
      g AS (
        SELECT *, sum(CASE WHEN coalesce(prev_type, '') <> 'error' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY pos) AS run_id
        FROM s WHERE event_type = 'error'),
      runs AS (
        SELECT user_id, run_id, max(pos) AS p1
        FROM g GROUP BY user_id, run_id),
      -- The NFA's within-clock starts at the bound run's FIRST event, so
      -- a too-old run prefix is dropped and the longest within-compliant
      -- suffix (still ending at the view) matches.
      matches AS (
        SELECT r.user_id, r.run_id, r.p1, nxt.event_id AS view_id, nxt.tus AS vtus
        FROM runs r
        JOIN s nxt ON nxt.user_id = r.user_id AND nxt.pos = r.p1 + 1
        WHERE nxt.event_type = 'view')
      SELECT m.user_id,
             arg_min(g.event_id, g.pos) AS first_err,
             CAST(m.p1 - min(g.pos) + 1 AS INT) AS n_errs,
             m.view_id
      FROM matches m
      JOIN g ON g.user_id = m.user_id AND g.run_id = m.run_id
      WHERE m.vtus - g.tus < 7200000000
      GROUP BY m.user_id, m.run_id, m.p1, m.view_id
      ORDER BY m.user_id, first_err""",

    "f09_url_map" -> """
      SELECT c_custkey,
        'shop.example.com' AS host,
        '/c/' || c_custkey AS path,
        'seg=' || c_mktsegment || '&v=1' AS query,
        c_mktsegment AS seg_param,
        c_mktsegment AS seg_map,
        CAST(c_custkey AS VARCHAR) AS key_map,
        2 AS n_keys
      FROM customer
      ORDER BY c_custkey""",

    "it02_pagerank" -> """
      WITH RECURSIVE
      edges AS (
        SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      nodes AS (SELECT DISTINCT n FROM
        (SELECT src AS n FROM edges UNION SELECT dst FROM edges)),
      deg AS (SELECT src, count(1) AS d FROM edges GROUP BY src),
      nn AS (SELECT count(1) AS cnt FROM nodes),
      pr(iter, n, r) AS (
        SELECT 0, n, 1.0 / cnt FROM nodes CROSS JOIN nn
        UNION ALL
        SELECT pr0.iter + 1, pr0.n,
          0.15 / (SELECT cnt FROM nn)
            + 0.85 * coalesce((
              SELECT CAST(sum(CAST(floor((p2.r / deg.d) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
              FROM pr p2 JOIN edges e ON p2.n = e.src JOIN deg ON e.src = deg.src
              WHERE e.dst = pr0.n AND p2.iter = pr0.iter), 0.0)
        FROM pr pr0
        WHERE pr0.iter < 5)
      SELECT n AS node, round(r, 9) AS rank FROM pr WHERE iter = 5
      ORDER BY node""",

    // Fixed-round Bellman-Ford: after 6 rounds each node holds the
    // cheapest <=6-hop distance — an exact integer function of the
    // graph, replayed round for round (sentinel = 2^60; sentinel + w
    // relaxations lose every least(), identically in both engines).
    "it03_sssp" -> """
      WITH RECURSIVE
      base AS (SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      edges AS (SELECT a AS src, b AS dst FROM base
                UNION ALL SELECT b, a FROM base),
      wedges AS (SELECT src, dst, (src + dst) % 9 + 1 AS w FROM edges),
      nodes AS (SELECT DISTINCT src AS n FROM edges),
      s0 AS (SELECT min(src) AS s FROM edges),
      d(iter, n, dist) AS (
        SELECT 0, n, CASE WHEN n = (SELECT s FROM s0) THEN CAST(0 AS BIGINT)
                     ELSE CAST(1152921504606846976 AS BIGINT) END
        FROM nodes
        UNION ALL
        SELECT d0.iter + 1, d0.n,
          least(d0.dist, coalesce((
            SELECT min(d2.dist + e.w)
            FROM d d2 JOIN wedges e ON d2.n = e.src
            WHERE e.dst = d0.n AND d2.iter = d0.iter),
            CAST(1152921504606846976 AS BIGINT)))
        FROM d d0 WHERE d0.iter < 6)
      SELECT n AS node, CAST(dist AS BIGINT) AS dist FROM d
      WHERE iter = 6 AND dist < 1152921504606846976
      ORDER BY node""",

    // Triangles once each via the canonical a<b<c triple join — the
    // oracle is orientation-free, so it independently checks the
    // degree-ordered enumeration.
    // Fixed-20-round Bellman-Ford fixpoint — identical CTE shape to
    // it03, run past convergence so it equals the delta iteration's
    // early-terminated answer.
    "it05_sssp_delta" -> """
      WITH RECURSIVE
      base AS (SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      edges AS (SELECT a AS src, b AS dst FROM base
                UNION ALL SELECT b, a FROM base),
      wedges AS (SELECT src, dst, (src + dst) % 9 + 1 AS w FROM edges),
      nodes AS (SELECT DISTINCT src AS n FROM edges),
      s0 AS (SELECT min(src) AS s FROM edges),
      d(iter, n, dist) AS (
        SELECT 0, n, CASE WHEN n = (SELECT s FROM s0) THEN CAST(0 AS BIGINT)
                     ELSE CAST(1152921504606846976 AS BIGINT) END
        FROM nodes
        UNION ALL
        SELECT d0.iter + 1, d0.n,
          least(d0.dist, coalesce((
            SELECT min(d2.dist + e.w)
            FROM d d2 JOIN wedges e ON d2.n = e.src
            WHERE e.dst = d0.n AND d2.iter = d0.iter),
            CAST(1152921504606846976 AS BIGINT)))
        FROM d d0 WHERE d0.iter < 20)
      SELECT n AS node, CAST(dist AS BIGINT) AS dist FROM d
      WHERE iter = 20 AND dist < 1152921504606846976
      ORDER BY node""",

    "it04_triangle_count" -> """
      WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
      co AS (
        SELECT x.sk AS s, y.sk AS p, count(1) AS c
        FROM li x JOIN li y ON x.ok = y.ok AND x.sk <> y.sk
        GROUP BY 1, 2),
      top AS (
        SELECT s, p FROM (
          SELECT s, p, row_number() OVER (PARTITION BY s
            ORDER BY c DESC, p) AS rk FROM co)
        WHERE rk <= 8),
      und AS (
        SELECT DISTINCT least(s, p) AS a, greatest(s, p) AS b FROM top),
      tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
      members AS (
        SELECT x AS supp FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
      SELECT supp, CAST(count(1) AS BIGINT) AS n_tri
      FROM members GROUP BY supp ORDER BY supp""",

    "it01_connected_components" -> """
      WITH RECURSIVE
      base AS (
        WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
        g AS (SELECT doc_id,
                CASE WHEN len(words) >= 3
                  THEN list_distinct(list_transform(range(1, len(words) - 1),
                         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
                  ELSE [] END AS shingles
              FROM w),
        e AS (SELECT doc_id AS id, unnest(shingles) AS sh FROM g),
        sizes AS (SELECT doc_id AS id, len(shingles) AS n FROM g),
        inter AS (SELECT a.id AS id_a, b.id AS id_b, count(1) AS inter
                  FROM e a JOIN e b ON a.sh = b.sh AND a.id < b.id
                  GROUP BY 1, 2)
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8),
      edges AS (
        SELECT id_a AS a, id_b AS b FROM base
        UNION SELECT id_b, id_a FROM base),
      reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      nodes AS (SELECT DISTINCT a AS id FROM edges)
      SELECT n.id, least(n.id, min(r.b)) AS label
      FROM nodes n LEFT JOIN reach r ON r.a = n.id
      GROUP BY n.id
      ORDER BY n.id""",

    // 3 synchronous LPA rounds unrolled (most-frequent neighbour
    // label, min tie-break — deterministic, so each round replays).
    "it06_label_propagation" -> """
      WITH base AS (
        WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
        g AS (SELECT doc_id,
                CASE WHEN len(words) >= 3
                  THEN list_distinct(list_transform(range(1, len(words) - 1),
                         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
                  ELSE [] END AS shingles
              FROM w),
        e AS (SELECT doc_id AS id, unnest(shingles) AS sh FROM g),
        sizes AS (SELECT doc_id AS id, len(shingles) AS n FROM g),
        inter AS (SELECT a.id AS id_a, b.id AS id_b, count(1) AS inter
                  FROM e a JOIN e b ON a.sh = b.sh AND a.id < b.id
                  GROUP BY 1, 2)
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8),
      edges AS (
        SELECT id_a AS a, id_b AS b FROM base
        UNION SELECT id_b, id_a FROM base),
      l0 AS (SELECT DISTINCT a AS id, a AS label FROM edges),
      l1 AS (SELECT id, label FROM (
               SELECT e.a AS id, l.label,
                      row_number() OVER (PARTITION BY e.a
                        ORDER BY count(1) DESC, l.label) AS rk
               FROM edges e JOIN l0 l ON l.id = e.b
               GROUP BY e.a, l.label) WHERE rk = 1),
      l2 AS (SELECT id, label FROM (
               SELECT e.a AS id, l.label,
                      row_number() OVER (PARTITION BY e.a
                        ORDER BY count(1) DESC, l.label) AS rk
               FROM edges e JOIN l1 l ON l.id = e.b
               GROUP BY e.a, l.label) WHERE rk = 1),
      l3 AS (SELECT id, label FROM (
               SELECT e.a AS id, l.label,
                      row_number() OVER (PARTITION BY e.a
                        ORDER BY count(1) DESC, l.label) AS rk
               FROM edges e JOIN l2 l ON l.id = e.b
               GROUP BY e.a, l.label) WHERE rk = 1)
      SELECT id, label FROM l3 ORDER BY id"""
  )
}
