"""Graph-analytics queries over the order bipartite graph.

The connected-components family (plans/dedup.py) covers undirected
reachability; this module adds rank propagation. The distinguishing
trick is EXACT integer arithmetic: iterative float ranking is
summation-order-dependent (the q01 half-cent lesson, at every
iteration), so ranks live in integer micro-units with floor-division
contributions — bit-identical across engines AND partitionings, which
is what lets an iterative algorithm be hash-oracle-checked at all.

Builder contract note (ADVICE r17): the iterative builders here run
EAGER actions at plan-construction time (persist + count to
materialize the graph caches before the iteration plan is composed),
so an explain-only or schema-only caller pays full upstream
materialization. All in-tree callers execute the plan anyway; tooling
that only wants the plan shape should expect the cache-build jobs.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session

# Supplier nodes live in NEGATIVE id space (-(s_suppkey + 1)) so the
# two partitions can never collide at any scale factor — an additive
# offset (the earlier design) silently merges nodes once customer keys
# outgrow it (TPC-H custkeys pass 1M around SF 7).

_PR_ITER_SQL = """
r{k} AS (
  SELECT e.dst AS id,
         CAST(150000 + SUM((r{j}.r * 17) // (20 * deg.d)) AS BIGINT) AS r
  FROM edges e
  JOIN r{j} ON r{j}.id = e.src
  JOIN deg ON deg.src = e.src
  GROUP BY e.dst
)"""


def _pagerank_oracle(iters: int) -> str:
    steps = ",".join(_PR_ITER_SQL.format(k=k, j=k - 1) for k in range(1, iters + 1))
    return f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT c AS src, -(s + 1) AS dst FROM pairs
  UNION ALL
  SELECT -(s + 1) AS src, c AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS r FROM deg),
{steps}
SELECT id AS node_id,
       CASE WHEN id < 0 THEN 'supplier' ELSE 'customer' END
         AS node_type,
       r AS rank_units
FROM r{iters}
"""


@register(
    "q_pagerank_order_graph",
    oracle=_pagerank_oracle(3),
    tags=("graph", "pagerank", "iterative"),
)
def q_pagerank_order_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three PageRank iterations over the customer↔supplier graph, in
    exact integer micro-units.

    Graph: an undirected bipartite random-walk graph — one edge per
    distinct (customer, supplier) trading pair from orders⋈lineitem,
    materialized in both directions. Rank update is the standard
    damped form r' = 0.15 + 0.85·Σ r(u)/deg(u), but evaluated as
    ``150000 + Σ (r·17) div (20·deg)`` on BIGINT micro-units: floor
    division makes every contribution exact, so the aggregate is
    order-independent and the DuckDB oracle hash-matches an
    *iterative* algorithm — impossible with doubles, where each
    iteration compounds summation-order noise.

    Scale shape: the driver loop only composes the lazy plan (3
    unrolled join+agg rounds, no action, nothing collected); each
    round is an equi-join of edges against the previous rank table,
    shuffling on node id — uniform by hashing. Every node has degree
    ≥ 1 by construction, so no dangling-mass term is needed.
    """
    tune_session(spark)
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    supp_id = -(F.col("s") + 1)
    from etl_project_spark.session import scoped_persist

    # The graph is read by every iteration: without persist each of the
    # 3 rounds re-derives edges from the orders⋈lineitem join — at
    # 100 TB that's re-reading the fact tables per iteration. Two build
    # choices matter (round-7, cut 28 exchanges to single digits):
    # (a) both edge directions come from ONE explode over `pairs`, not
    #     a union of two selects — a union re-derives the orders⋈
    #     lineitem join + distinct per branch (explain showed 28 scans);
    # (b) edges persist PRE-PARTITIONED on src, so the degree agg and
    #     every iteration's rank join consume the cached partitioning
    #     instead of re-shuffling the (static) graph per round. Only
    #     the per-round rank table moves after that — the canonical
    #     iterative-graph layout on any cluster.
    # scoped_persist (r6): builders can't unpersist their own caches
    # pre-action; the harness releases them via release_persists.
    both_dirs = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("c").alias("src"), supp_id.alias("dst")),
                F.struct(supp_id.alias("src"), F.col("c").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    edges = scoped_persist(both_dirs.repartition("src"))
    deg = scoped_persist(edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")))
    # Materialize both caches BEFORE composing the iteration plan:
    # under AQE a *pending* InMemoryRelation reports unknown output
    # partitioning (its cached plan is a non-final AdaptiveSparkPlan),
    # so every downstream consumer re-shuffles the cached frame with
    # an ENSURE_REQUIREMENTS exchange; a materialized cache exposes
    # its final hash(src) partitioning and the per-iteration edge/deg
    # joins consume it directly (guide §2.4). The count IS the cache
    # build the first action would pay anyway — no extra data pass
    # (plan: 13 → 8 Exchanges, the survivors keyed on per-round rank
    # output only; r17 interleaved A/B sf0.1 runtime-neutral — the
    # elided exchanges carry MBs here, a full edge-set shuffle per
    # iteration at scale).
    # r18 (VERDICT r17 #3): ONE materialization action, not two — deg
    # is an aggregate OVER the persisted edges, so deg.count() builds
    # the edges cache in the same pass; the separate edges.count() was
    # a redundant driver-visible job on the cold one-shot path.
    deg.count()
    ranks = deg.select(F.col("src").alias("id"), F.lit(1_000_000).cast("bigint").alias("r"))
    for _ in range(3):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["id"])
            .join(deg, "src")
            .select("dst", F.expr("(r * 17) div (20 * d)").alias("contrib"))
        )
        ranks = contrib.groupBy(F.col("dst").alias("id")).agg(
            (F.lit(150_000) + F.sum("contrib")).cast("bigint").alias("r")
        )
    return ranks.select(
        F.col("id").alias("node_id"),
        F.when(F.col("id") < 0, "supplier")
        .otherwise("customer")
        .alias("node_type"),
        F.col("r").alias("rank_units"),
    )


@register(
    "q_triangle_count_nations",
    oracle="""
WITH edges AS (
  SELECT DISTINCT LEAST(c.c_nationkey, s.s_nationkey) AS a,
                  GREATEST(c.c_nationkey, s.s_nationkey) AS b
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.b
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
), nodes AS (
  SELECT x AS nationkey FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY nationkey
""",
    tags=("graph", "triangle"),
)
def q_triangle_count_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the nation co-trade graph.

    Graph construction is itself a relational pipeline (the common
    case at scale — the graph never exists as a file): edges =
    distinct undirected (customer-nation, supplier-nation) pairs that
    actually traded, from the lineitem⋈orders⋈customer⋈supplier
    star join. Triangle enumeration is the classic two-hop equi-join
    with the canonical a<b<c orientation — storing every edge as
    (lo, hi) makes each triangle appear exactly once, so no
    post-dedup and no factor-6 overcount; cost is bounded by the
    two-path count, the standard distributed formulation (the
    degree-ordered refinement drops in unchanged if hub skew ever
    dominates). Per-node counts come from exploding each triangle's
    three corners into a hash aggregate.

    Scale: the heavy part is the star join building the edge list —
    dims broadcast, lineitem never shuffles for them; the distinct
    collapses to a key space bounded by nation² long before the
    triangle joins, which then run on a tiny relation. On a billion-
    node graph the same plan holds with edges hash-partitioned on the
    join key and AQE handling hub skew.
    """
    tune_session(spark)
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    # r18 (VERDICT r17 #2): customer/supplier dims are SF-linear, so a
    # forced F.broadcast() hint would bypass the planner's size gate
    # and break at 100 TB. Un-hinted, the 10 MB auto-broadcast
    # threshold (and AQE's exact runtime sizes) still picks BHJ at any
    # scale where the dims genuinely fit, and degrades safely when
    # they do not.
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .distinct()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    nodes = (
        tri.select(F.col("x").alias("nationkey"))
        .unionAll(tri.select(F.col("y").alias("nationkey")))
        .unionAll(tri.select(F.col("z").alias("nationkey")))
    )
    return nodes.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n_triangles"))


_LPA_ROUNDS = 2


def _lpa_oracle(rounds: int) -> str:
    """Unrolled SQL replay of weighted label propagation (see
    q_label_propagation_communities)."""
    ctes = ["""
edges AS (
  SELECT a.l_suppkey AS src, b.l_suppkey AS dst, COUNT(*) AS w
  FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY 1, 2
),
l0 AS (SELECT DISTINCT l_suppkey AS id, l_suppkey AS label FROM lineitem)"""]
    for r in range(1, rounds + 1):
        j = r - 1
        ctes.append(f"""
v{r} AS (
  SELECT e.dst AS id, l{j}.label, SUM(e.w) AS votes
  FROM edges e JOIN l{j} ON e.src = l{j}.id
  GROUP BY e.dst, l{j}.label
),
l{r} AS (
  SELECT id, FIRST(label ORDER BY votes DESC, label) AS label
  FROM v{r} GROUP BY id
)""")
    return (
        "WITH " + ",".join(ctes) + f"""
SELECT label AS community, COUNT(*) AS n_members, MIN(id) AS min_member
FROM l{rounds}
GROUP BY label"""
    )


@register(
    "q_label_propagation_communities",
    oracle=_lpa_oracle(_LPA_ROUNDS),
    tags=("graph", "community", "label-propagation"),
)
def q_label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted label propagation over the supplier co-shipment graph:
    2 synchronous rounds, each vertex adopting the neighbor label with
    the most edge-weight votes (ties to the smallest label — the
    determinism rule that makes an LPA hash-checkable).

    Edges persist once (scoped_persist) and feed every round; a round
    is one equi-join + one (vertex, label) hash-agg + one argmax — no
    collects, no vertex-centric runtime. Integer vote weights keep the
    argmax exact in both engines.
    """
    from etl_project_spark.session import scoped_persist

    tune_session(spark)
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    basket = li.distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    # Cache the graph partitioned on the per-round join key and
    # materialize it (r17): the (src, dst) agg layout satisfies no
    # downstream requirement, while hash(src) feeds both rounds' vote
    # joins — and only a FINAL (materialized) cache exposes its
    # partitioning under AQE (see q_pagerank_order_graph). One extra
    # node-pair-sized exchange at build time buys an edge-set shuffle
    # per round.
    edges = scoped_persist(
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .groupBy(F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .repartition("src")
    )
    edges.count()
    labels = li.select(F.col("l_suppkey").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        votes = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("vid"), "label")
            .agg(F.sum("w").alias("votes"))
        )
        labels = votes.groupBy(F.col("vid").alias("id")).agg(
            F.max_by("label", F.struct(F.col("votes"), -F.col("label"))).alias("label")
        )
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("id").alias("min_member"),
    )


_KCORE_K = 12

_KCORE_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
e0 AS (
  SELECT c AS src, -(s + 1) AS dst FROM pairs
  UNION ALL
  SELECT -(s + 1) AS src, c AS dst FROM pairs
),
d0 AS (SELECT src, COUNT(*) AS d FROM e0 GROUP BY src),
v1 AS (SELECT src FROM d0 WHERE d >= {_KCORE_K}),
e1 AS (
  SELECT e.src, e.dst FROM e0 e
  JOIN v1 a ON e.src = a.src
  JOIN v1 b ON e.dst = b.src
),
d1 AS (SELECT src, COUNT(*) AS d FROM e1 GROUP BY src),
v2 AS (SELECT src FROM d1 WHERE d >= {_KCORE_K}),
e2 AS (
  SELECT e.src, e.dst FROM e1 e
  JOIN v2 a ON e.src = a.src
  JOIN v2 b ON e.dst = b.src
),
d2 AS (SELECT src, COUNT(*) AS d FROM e2 GROUP BY src),
lvl AS (
  SELECT 0 AS round, src, d FROM d0
  UNION ALL SELECT 1, src, d FROM d1
  UNION ALL SELECT 2, src, d FROM d2
)
SELECT round,
       CASE WHEN src < 0 THEN 'supplier' ELSE 'customer' END AS node_type,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MIN(d) AS BIGINT) AS min_deg,
       CAST(MAX(d) AS BIGINT) AS max_deg
FROM lvl GROUP BY round, node_type
"""


@register(
    "q_kcore_trading_graph",
    oracle=_KCORE_ORACLE,
    tags=("graph", "kcore", "iterative"),
)
def q_kcore_trading_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled rounds of k-core peeling (k=12) on the
    customer↔supplier trading graph: drop nodes with degree < k,
    recompute degrees on the induced subgraph, repeat — the classic
    graph-densification filter (spam/bot subgraph isolation, community
    nucleus extraction). Reports node counts and degree ranges per
    peeling round and node side.

    Each round is degree hash-agg → semi-join edge filter on BOTH
    endpoints — pure equi-joins on node ids, the distributed k-core
    formulation (at full convergence you'd iterate to fixpoint;
    rounds are unrolled here for the same reason the PageRank loop
    is: a hash-checkable deterministic prefix). Edges persist once
    pre-partitioned on ``src``; the survivor vertex sets are
    broadcast-sized long before round 2 at any scale.
    """
    from etl_project_spark.session import scoped_persist

    tune_session(spark)
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    supp = -(F.col("s") + 1)
    edges = scoped_persist(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("c").alias("src"), supp.alias("dst")),
                    F.struct(supp.alias("src"), F.col("c").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .repartition("src")
    )
    # Same pending-cache pitfall as q_pagerank_order_graph: every
    # degree aggregate and endpoint filter in the peel rounds keys on
    # src, so materializing the cache up front lets all of them read
    # the cached hash(src) layout instead of re-shuffling it (plan:
    # 26 → 5 Exchanges, every join now broadcast over the cached
    # layout). r18: the round-0 degree cache build below (d.count())
    # aggregates over the persisted edges, so it materializes BOTH
    # caches in one pass — the separate edges.count() was a redundant
    # cold-path job (VERDICT r17 #3).

    def degrees(e: DataFrame) -> DataFrame:
        return e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))

    levels = []
    e, d = edges, degrees(edges)
    # Each round's degree table fans out to TWO consumers (its level
    # branch and the next round's survivor broadcast), and each
    # round's filtered edge set to two more (its degree agg and the
    # next round's filter input) — unpersisted, the final union
    # re-executed the whole peel chain per branch (26 cache passes
    # in the plan). Persisting the per-round state makes the plan a
    # straight line: one pass builds each round, every reader hits a
    # cache. Degree tables are node-sized, filtered edges strictly
    # shrink — both trivially cacheable at any scale. Measured r17
    # (interleaved sf0.1 A/B): 3.29 → 2.72 s median.
    d = scoped_persist(d)
    d.count()
    levels.append(d.withColumn("round", F.lit(0)))
    for r in (1, 2):
        # r18 (VERDICT r17 #2): NO forced broadcast hint. The survivor
        # node set is customers ∪ suppliers filtered by degree — LINEAR
        # in SF, so an unconditional F.broadcast() bypasses AQE's size
        # gate and OOMs the driver at 100 TB (tens of GB of ids). AQE
        # decides instead: the degree agg's runtime statistics are
        # exact, so at bench scale it still converts the join to a
        # broadcast (survivors are KBs here) while at scale it keeps a
        # size-gated hash join — the session SHJ confs (session.py)
        # capture the local win without the hint.
        v = d.filter(F.col("d") >= _KCORE_K).select("src")
        e = (
            e.join(v.withColumnRenamed("src", "sv"), F.col("src") == F.col("sv"))
            .drop("sv")
            .join(v.withColumnRenamed("src", "dv"), F.col("dst") == F.col("dv"))
            .drop("dv")
        )
        # Persist only the NODE-sized degree tables, never the edge
        # sets (r17 sf1 check): caching e1 wrote the surviving edge
        # set back out and measured kcore 4.1-6.3 → 7.0-7.6 s at sf1,
        # while recomputing e_r is a map-side broadcast-join pass over
        # the cached base edges — cheap at any scale. The d persists
        # alone keep the sf0.1 win (3.29 → 2.72 s) because they cut
        # the degree-agg re-execution the union fans out.
        d = degrees(e)
        if r < 2:
            d = scoped_persist(d)
            d.count()
        levels.append(d.withColumn("round", F.lit(r)))
    lvl = levels[0].unionByName(levels[1]).unionByName(levels[2])
    return (
        lvl.groupBy(
            "round",
            F.when(F.col("src") < 0, "supplier").otherwise("customer").alias(
                "node_type"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("d").alias("min_deg"),
            F.max("d").alias("max_deg"),
        )
    )


# --------------------------------------------------------------------------
# Link prediction: Adamic-Adar over a degree-BOUNDED co-shipment
# graph. The raw co-shipment graph is dense (every supplier pair
# eventually shares an order), so two-hop enumeration on it is
# quadratic; sparsifying first to each supplier's top-8 partners
# makes the two-hop join O(n · k²) with k fixed — the standard
# production shape for link prediction at scale (score only the
# neighborhood graph, not the clique). Every stage is a hash
# shuffle on a key whose fan-out is bounded by construction:
# l_orderkey (lines per order ≤ 7), the pair key, and the top-8
# adjacency. The one residual skew risk is a "hub" supplier kept in
# MANY partners' top-8 lists (in-degree is not capped); its per-z
# fan-out is deg(z)² — AQE skew-split handles it, and k² = 64 keeps
# even a full-table hub tractable.
# --------------------------------------------------------------------------
_AA_TOPK = 8


@register(
    "q_adamic_adar_suppliers",
    oracle=f"""
WITH os AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), copairs AS (
  SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, COUNT(*) AS c
  FROM os a JOIN os b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
  GROUP BY 1, 2
), kept AS (
  SELECT sa, sb FROM (
    SELECT sa, sb,
           ROW_NUMBER() OVER (PARTITION BY sa ORDER BY c DESC, sb) AS rn
    FROM copairs
  ) WHERE rn <= {_AA_TOPK}
), und AS (
  SELECT DISTINCT LEAST(sa, sb) AS u, GREATEST(sa, sb) AS v FROM kept
), adj AS (
  SELECT u AS src, v AS dst FROM und
  UNION ALL
  SELECT v AS src, u AS dst FROM und
), deg AS (
  SELECT src, COUNT(*) AS d FROM adj GROUP BY src
)
SELECT t1.dst AS supp_a, t2.dst AS supp_b,
       CAST(COUNT(*) AS BIGINT) AS n_common,
       ROUND(SUM(1.0 / LN(deg.d)), 6) AS aa_score
FROM adj t1
JOIN adj t2 ON t1.src = t2.src AND t1.dst < t2.dst
JOIN deg ON deg.src = t1.src
LEFT JOIN und e ON e.u = t1.dst AND e.v = t2.dst
WHERE e.u IS NULL
GROUP BY 1, 2
""",
    tags=("graph", "link-prediction", "adamic-adar"),
)
def q_adamic_adar_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the top-8-sparsified supplier
    co-shipment graph: for every non-adjacent pair with at least one
    common neighbor, Σ 1/ln(deg(z)) over common neighbors z.

    Scale shape in the module comment. Every common neighbor has
    degree ≥ 2 by construction (it is adjacent to both endpoints), so
    ln(deg) ≥ ln 2 and the score is well-defined. Cross-engine float
    discipline: edge selection ranks on EXACT integer counts with an
    id tiebreak, so both engines sparsify to the identical graph; the
    score is a short sum of 1/ln(small-int) terms, stable ~1e-15,
    snapped at 6 decimals.
    """
    tune_session(spark)
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    copairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("sa"), F.col("b.l_suppkey").alias("sb")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("sa").orderBy(F.col("c").desc(), F.col("sb"))
    )
    kept = copairs.withColumn("rn", rn).filter(F.col("rn") <= _AA_TOPK)
    from etl_project_spark.session import scoped_persist

    # r18: REVERTED the r17 src-keyed adjacency persist (VERDICT r17
    # #5 — the 4.62→4.09 claim did not survive a clean window: the
    # deduped exchange count ROSE 12→17 because the persist doubles
    # the und frame in both orientations before caching, and both the
    # driver (0.72×) and the clean-window record (4.1→4.34 cold) read
    # slower). Back to the r16 shape: persist the one-directional und
    # only — it feeds three branches (both adjacency aliases + the
    # anti-join) and AQE's ReusedExchange dedups the shared lineage;
    # the sf10 variance rationale from r13 carries over.
    und = scoped_persist(
        kept.select(
            F.least("sa", "sb").alias("u"), F.greatest("sa", "sb").alias("v")
        ).distinct()
    )
    adj = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    t1 = adj.alias("t1")
    t2 = adj.alias("t2")
    cand = t1.join(
        t2,
        (F.col("t1.src") == F.col("t2.src")) & (F.col("t1.dst") < F.col("t2.dst")),
    ).select(
        F.col("t1.src").alias("z"),
        F.col("t1.dst").alias("supp_a"),
        F.col("t2.dst").alias("supp_b"),
    )
    non_adj = cand.join(
        und,
        (cand.supp_a == und.u) & (cand.supp_b == und.v),
        "left_anti",
    )
    return (
        non_adj.join(deg, non_adj.z == deg.src)
        .groupBy("supp_a", "supp_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.round(F.sum(F.lit(1.0) / F.log(F.col("d").cast("double"))), 6).alias(
                "aa_score"
            ),
        )
    )
