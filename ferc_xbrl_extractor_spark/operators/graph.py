"""Link-graph quality propagation (G65): integer-exact PageRank.

Crawl-scale curation pipelines rank hosts/pages by link-graph centrality
(CommonCrawl's harmonic-centrality rankings, PageRank-weighted crawl
frontiers) and use the score as a quality prior alongside the text
signals (G4/G28/G34). This module provides the propagation primitive as
plain DataFrame ops.

Scale shape — per iteration:
  ranks ⋈ edges on ``src``   (both sides arrive hash-partitioned on the
                              key after the first iteration — one keyed
                              exchange each, no broadcast of anything
                              corpus-sized)
  → per-edge contribution    (pure projection, integer floor arithmetic)
  → groupBy(dst).sum         (map-side partial combine — a hub page's
                              in-links combine before the shuffle)
  → left join onto the node list (in-linkless nodes keep the base mass).
The ranks relation is O(|nodes|); iterative lineage is cut periodically
with ``localCheckpoint`` so long runs never compound the plan (same
policy as ``neardup.connected_components``). The node list is
checkpointed once (eager, ContextCleaner-reclaimed — no cache
registration to leak); the degreed edge relation stays lazy, its keyed
exchange reused across iterations.

Integer exactness: ranks live in micro-units; every division is a
``floor`` on integers, so the recurrence
  r_{t+1}(v) = BASE + Σ_{u→v} floor(85 · r_t(u) / (100 · outdeg(u)))
  BASE       = floor(15 · 1_000_000 / (100 · N))
is bit-replayable by a SQL oracle that unrolls the same iterations (the
G37 k-means pattern). Dangling mass (nodes with no out-edges) is
dropped, not redistributed — the standard simplification; scores remain
a valid quality ORDERING, which is what curation consumes.

No reference counterpart (the reference is an XBRL ETL); SURVEY.md
§2.12 gap surface, G-series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edges_with_outdegree(e: DataFrame) -> DataFrame:
    """Attach out-degree to a (__s, __d) edge relation as ``__deg``.

    Shape pin (tests/test_gap_operators.py): a groupBy aggregate joined
    back — map-side combinable, AQE-skew-splittable — never a count
    window partitioned by __s, which would serialize a hub source's
    whole out-edge list through one task."""
    deg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
    return e.join(deg, "__s")


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    damping_pct: int = 85,
    unit: int = 1_000_000,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge list.

    Args:
        edges: (src, dst) relation; duplicate edges are collapsed (a
            link counts once, like the crawl-graph convention).
        iters: Lloyd-style fixed iteration count — fixed, not
            convergence-tested, so the oracle can unroll it.
        damping_pct: damping factor in percent (85 = the classic 0.85).
        unit: micro-unit scale for the integer ranks.

    Returns (node, rank_micro) — higher is more central. Total mass is
    NOT conserved (dangling mass drops); consumers use the ordering.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).distinct()
    # nodes is consumed iters+2 times (count, every round's left join);
    # an EAGER localCheckpoint materializes the O(|nodes|) relation once
    # and lets ContextCleaner reclaim the blocks when the result is
    # dropped — unlike persist(), which stays registered in the
    # CacheManager until an explicit unpersist (the r6 form leaked one
    # cached relation per call on a long-lived session). Only this tiny
    # relation is checkpointed: materializing anything bigger eagerly
    # executes its subplan WITHOUT adaptive query execution (measured
    # 0.7 → 7.9s at sf0.1 when the final ranks were eagerly cut).
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # bounded: one long, served from the checkpoint
    base = (15 * unit) // (100 * n)
    # out-degree rides WITH the edge relation (one join per iteration,
    # not two). Degree is a groupBy aggregate joined back — map-side
    # combinable and AQE-skew-splittable — NOT a count window: a window
    # partitioned by __s would serialize a hub source's entire out-edge
    # list (10⁷ links for an index page in a crawl graph) through one
    # task at this one-time materialization. e2 stays LAZY: its keyed
    # exchange is canonically identical across the iteration references,
    # so exchange reuse shuffles the edge relation once per action — no
    # cache registration to leak.
    e2 = _edges_with_outdegree(e)
    ranks = nodes.withColumn("node_rank", F.lit(unit // n).cast("long"))
    for t in range(1, iters + 1):
        contrib = (
            ranks.join(e2, ranks["node"] == e2["__s"])
            .select(
                F.col("__d").alias("node"),
                F.floor(
                    F.lit(damping_pct) * F.col("node_rank")
                    / (F.lit(100) * F.col("__deg"))
                ).cast("long").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base) + F.coalesce(F.col("__in"), F.lit(0))
            ).cast("long").alias("node_rank"),
        )
        # Unlike connected_components (whose convergence test forces an
        # action every round), the iteration count here is FIXED — so
        # rounds chain into ONE job and the lineage cut is only needed
        # periodically to keep the plan bounded on long runs. A cut
        # every round tripled wall-clock at sf0.1 (per-round job
        # barriers, ~0.5s each on local[32]).
        if t % 8 == 0 and t < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    iters: int = 3,
    damping_pct: int = 85,
    unit: int = 1_000_000,
) -> str:
    """ANSI-SQL replay of :func:`pagerank` with the iterations UNROLLED
    (recursive CTEs cannot aggregate over the recursive term, so the
    loop is generated — the same pattern as the G37 k-means oracle).
    ``edges_sql`` must yield columns (src, dst)."""
    sql = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "outdeg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
        # DuckDB '/' is float division and CAST(double AS BIGINT)
        # ROUNDS — every division goes through an explicit FLOOR
        f"r0 AS (SELECT node, CAST(FLOOR({unit} * 1.0 / n) AS BIGINT) AS r"
        " FROM nodes, nn)",
    ]
    prev = "r0"
    for t in range(1, iters + 1):
        sql.append(
            f"c{t} AS (SELECT e.dst AS node, "
            f"SUM(CAST(FLOOR(({damping_pct} * {prev}.r) / (100.0 * outdeg.deg)) AS BIGINT)) AS m "
            f"FROM {prev} JOIN e ON {prev}.node = e.src "
            "JOIN outdeg ON e.src = outdeg.src GROUP BY e.dst)"
        )
        sql.append(
            f"r{t} AS (SELECT nodes.node, "
            f"CAST(FLOOR((15.0 * {unit}) / (100 * nn.n)) AS BIGINT)"
            f" + COALESCE(c{t}.m, 0) AS r "
            f"FROM nodes CROSS JOIN nn LEFT JOIN c{t} ON nodes.node = c{t}.node)"
        )
        prev = f"r{t}"
    return (
        "WITH " + ",\n".join(sql)
        # SUM(BIGINT) is HUGEINT in DuckDB — cast back so the typed
        # value-hash compare sees int64 on both engines
        + f"\nSELECT node, CAST(r AS BIGINT) AS node_rank FROM {prev}"
    )
