"""Iterative graph analytics on DataFrames.

Companion to operators.dedup.connected_components (pointer-jumping label
propagation): this module holds rank-propagation style algorithms. All
integer arithmetic — floor divisions at every step — so a fixed
iteration count yields BIT-IDENTICAL results on any engine, which is
what lets an iterative algorithm be value-oracled in SQL (unrolled
CTEs) instead of settling for a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 1_000_000_000_000  # ranks are parts-per-10^12


def pagerank_int(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """PageRank with 0.85 damping over a directed edge list, in pure
    integer arithmetic: every node starts at ``scale``; one iteration is

        contrib(v) = sum over edges (u, v) of  r(u) DIV outdeg(u)
        r'(v)      = (15*scale + 85*contrib(v)) DIV 100

    (floor division at both steps — deterministic on every engine, no
    float summation order to diverge). Dangling mass is dropped, the
    classic simplification.

    Scale shape per iteration: one hash join of the edge list against
    the (|V|-row) rank table + one map-combined aggregate — the standard
    distributed PageRank step. The rank/degree tables are node-sized, so
    AQE broadcasts them against a 100 TB edge list; lineage is truncated
    every iteration with localCheckpoint (the connected_components
    lesson — without it the plan doubles per round).

    Returns (name, rank) with rank in parts-per-``scale``.
    """
    # Materialize the (edge, outdeg) table and node list ONCE: every
    # iteration joins against them, and without truncation the upstream
    # edge-building lineage (often a multi-way join) re-executes per
    # round — measured 3.2s -> 2.3s for 3 rounds over the q126 trade
    # graph (the residue is per-job scheduling latency on a tiny
    # 25-node graph, not recompute). At real scale this is the
    # checkpoint-to-table step of any iterative job.
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col(src).alias("name"))
        .union(edges.select(F.col(dst).alias("name")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_outdeg"))
    e = edges.join(deg, src).localCheckpoint(eager=True)  # (src, dst, _outdeg)
    ranks = nodes.withColumn("r", F.lit(scale).cast("long"))
    base = 15 * scale
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("name", src), src)
            .select(
                F.col(dst).alias("name"),
                F.expr("r DIV _outdeg").alias("_c"),
            )
            .groupBy("name")
            .agg(F.sum("_c").alias("_sum"))
        )
        ranks = (
            nodes.join(contrib, "name", "left")
            .select(
                "name",
                (
                    (F.lit(base) + F.lit(85) * F.coalesce(F.col("_sum"), F.lit(0)))
                    .cast("long")
                ).alias("_num"),
            )
            .select("name", F.expr("_num DIV 100").alias("r"))
            .localCheckpoint(eager=False)
        )
    return ranks.select("name", F.col("r").alias("rank"))


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle count over an undirected edge list — the classic
    distributed graph statistic (clustering-coefficient numerator,
    community-density probe).

    Canonicalize every edge to (lo < hi), dedup, then count ordered
    wedges closed by a third edge: join edges (a<b) with edges (b<c) on
    the shared middle vertex and semi-join the closing (a<c) edge. Each
    triangle {a<b<c} is counted exactly once — as the wedge a-b-c closed
    by (a,c). Self-loops vanish in canonicalization (lo < hi strictly).

    Scale shape: two hash joins on single vertex keys, no explosion
    beyond the wedge count (bounded by sum of deg^2 — the inherent cost
    of triangle enumeration; production systems bound it by degree
    ordering exactly as done here: ordering wedges by vertex id is the
    standard 'count each triangle at its smallest vertex' trick that
    keeps high-degree hubs from being the middle of every wedge).
    Returns a 1-row (n_triangles) DataFrame.
    """
    # Materialize the canonical edge list once: _triangle_rows reads it
    # THREE times (ab/bc/ac), and without truncation each branch re-runs
    # the caller's whole edge-derivation subtree (plan audit showed 13
    # static shuffles on the co-supply build; any real triangle pipeline
    # materializes its edge list first). Lazy checkpoint keeps plan
    # construction action-free.
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    closed = _triangle_rows(e)
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge list canonicalized to (_a < _b), deduped;
    self-loops dropped."""
    lo = F.least(F.col(src), F.col(dst))
    hi = F.greatest(F.col(src), F.col(dst))
    return (
        edges.filter(F.col(src) != F.col(dst))
        .select(lo.alias("_a"), hi.alias("_b"))
        .distinct()
    )


def _triangle_rows(e: DataFrame) -> DataFrame:
    """One row (a < b < c) per triangle of the canonical edge list."""
    ab = e.select(F.col("_a").alias("a"), F.col("_b").alias("b"))
    bc = e.select(F.col("_a").alias("b"), F.col("_b").alias("c"))
    ac = e.select(F.col("_a").alias("a"), F.col("_b").alias("c"))
    wedges = ab.join(bc, "b")
    return wedges.join(ac, ["a", "c"], "left_semi")


def local_clustering(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-vertex local clustering coefficient — how close each vertex's
    neighborhood is to a clique (the community-tightness signal next to
    q161's global triangle count): lcc(v) = 2*tri(v) / (deg(v) *
    (deg(v)-1)) for deg >= 2.

    tri(v) comes from exploding each enumerated triangle (a<b<c) to its
    three member vertices — one extra narrow shuffle over the triangle
    set (small relative to the wedge join that found them); deg(v) is
    one map-side-combined count over exploded edge endpoints. The
    coefficient is held as the INTEGER floor of 2e6*tri/(deg*(deg-1))
    (Spark `div` == DuckDB `//`), so results are engine-exact. Returns
    (vertex, degree, n_triangles, lcc_e6); vertices with deg < 2 are
    excluded (coefficient undefined).
    """
    # Same materialization rationale as triangle_count — e feeds the
    # degree count AND all three _triangle_rows branches (five reads).
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    deg = (
        e.select(F.explode(F.array("_a", "_b")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri_v = (
        _triangle_rows(e)
        .select(F.explode(F.array("a", "b", "c")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tri_v, "vertex", "left")
        .select(
            "vertex",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.expr(
                "(2 * coalesce(n_triangles, 0) * CAST(1000000 AS BIGINT))"
                " div (degree * (degree - 1))"
            ).alias("lcc_e6"),
        )
    )


def label_propagation(
    edges: DataFrame, src: str = "src", dst: str = "dst", rounds: int = 3
) -> DataFrame:
    """SYNCHRONOUS label propagation (community detection): every
    vertex starts labeled with its own id; each round, every vertex
    adopts the most frequent label among its neighbors' PREVIOUS-round
    labels, ties broken by smallest label. Synchronous + deterministic
    tie-break is what makes the algorithm value-oracle-able (classic
    async LPA is order-dependent by construction) at the cost of the
    known oscillation mode on bipartite-ish structures — acceptable for
    a fixed small round count, documented here.

    Returns (vertex, community) after ``rounds`` rounds.

    Scale shape per round: one join of the adjacency list against the
    vocabulary-of-vertices label table (broadcastable when vertices <<
    edges), one map-side-combined (vertex, label) count, one window for
    the per-vertex argmax, then a localCheckpoint so the iterative
    lineage never compounds (the PageRank lesson)."""
    from pyspark.sql import Window

    e = _canonical_edges(edges, src, dst)
    adj = e.select(F.col("_a").alias("v"), F.col("_b").alias("n")).unionByName(
        e.select(F.col("_b").alias("v"), F.col("_a").alias("n"))
    ).localCheckpoint(eager=False)
    labels = adj.select("v").distinct().select("v", F.col("v").alias("lbl"))
    w = Window.partitionBy("v").orderBy(F.desc("c"), F.asc("lbl"))
    for _ in range(rounds):
        votes = (
            adj.join(
                labels.select(F.col("v").alias("n"), "lbl"), "n"
            )
            .groupBy("v", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", "lbl")
            .localCheckpoint(eager=True)
        )
    return labels.select(
        F.col("v").alias("vertex"), F.col("lbl").alias("community")
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS hop distance over an undirected edge list:
    every vertex in ``seeds`` (single column ``vertex``) starts at
    distance 0; each round relaxes one hop —

        d'(v) = min(d(v), 1 + min over neighbors n of d(n))

    Pure integer min-plus relaxation, so a fixed round count is
    deterministic and the result value-oracles as unrolled CTEs (the
    label-propagation discipline). Returns (vertex, dist) for vertices
    reached within ``rounds`` hops; unreached vertices are absent.

    Scale shape per round: one adjacency-vs-frontier join (the frontier
    table is the small side early on — AQE broadcasts it), one
    map-side-combined min per vertex, localCheckpoint to keep the
    iterative lineage flat. This is the Pregel-style BFS every graph
    engine runs; reference analytics surface has no graph ops, so this
    extends the family (PageRank/triangles/LPA) rather than mirroring
    a reference file."""
    e = _canonical_edges(edges, src, dst)
    adj = (
        e.select(F.col("_a").alias("v"), F.col("_b").alias("n"))
        .unionByName(e.select(F.col("_b").alias("v"), F.col("_a").alias("n")))
        .localCheckpoint(eager=False)
    )
    dist = seeds.select(
        F.col("vertex").alias("v"), F.lit(0).cast("long").alias("d")
    )
    for _ in range(rounds):
        relaxed = (
            adj.join(dist.select(F.col("v").alias("n"), "d"), "n")
            .select("v", (F.col("d") + F.lit(1)).alias("d"))
            .unionByName(dist)
            .groupBy("v")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)
        )
        dist = relaxed
    return dist.select(F.col("v").alias("vertex"), F.col("d").alias("dist"))
