"""Iterative graph algorithms as DataFrame loops (Pregel-on-DataFrames).

The reference has no graph surface; this extends the engine the same way
``ds_cluster_dedup`` (label propagation) does — PageRank is the standard
"importance over a link graph" signal a corpus-curation pipeline uses to
weight web documents (the original use case of the algorithm).

Scale design (100 TB of edges):
- one shuffle per iteration (the ``groupBy(dst)`` contribution sum);
  the rank⋈edge join hashes on ``src``, so pre-partitioning the edge
  table by ``src`` (bucketed layout, `sources/bucketed.py`) removes the
  edge-side exchange and only rank rows (2 columns) ever move;
- contributions are quantized to an integer grid BEFORE the sum, so the
  aggregation is an exact, order-independent BIGINT sum — map-side
  partial aggregation applies and the result is bitwise reproducible
  regardless of partitioning (the property the DuckDB oracle relies on);
- ``localCheckpoint`` per iteration cuts the growing lineage exactly as
  the label-propagation loop does (queries.py ds_cluster_dedup).

Determinism: every per-row step is plain double arithmetic (rank/outdeg,
damping multiply, teleport add) — identical on any engine; the only
multi-row reduction is the BIGINT sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID = 1e12  # contribution quantum: floor(contrib * GRID + 0.5) as BIGINT


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 1,
    broadcast_max_nodes: int = 5_000_000,
    checkpoint_edges: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    ``edges`` must have ``src`` / ``dst`` string columns and cover every
    node as a source (a node with NO out-edges leaks its rank mass, the
    standard dangling-node caveat — add reverse edges or self-loops
    first; the bipartite both-ways construction in
    ``ds_pagerank_partsupp`` guarantees it). Nodes without IN-edges are
    handled: they keep their teleport rank every iteration.

    Returns ``(node, rank)`` with ``rank`` as DOUBLE. Ranks are the
    exact 3-iteration power-method values on the teleporting random
    walk, not a converged fixpoint — fixed iteration count keeps the
    result oracle-checkable and the cost bounded.
    """
    # edges and outdeg are read every iteration — materialize once
    # instead of re-running the upstream distinct/scan per iteration.
    # ``checkpoint_edges=False`` is for a PERSISTED (e.g. bucketed)
    # edge layout: re-reading the scan per iteration keeps the scan's
    # HashPartitioning visible to the planner, so the per-iteration
    # contribution groupBy needs NO exchange when the layout is
    # bucketed on ``dst`` (r14; sources/bucketed.py) — a checkpoint
    # here would be RDD-backed and offer no such guarantee.
    if checkpoint_edges:
        edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # n is one scalar — the only driver-side value in the loop; counting
    # also materializes the checkpointed node set reused every iteration
    nodes = nodes.localCheckpoint(eager=False)
    n = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # r13: carry outdeg INSIDE the rank state (node, rank, outdeg), so
    # each iteration runs ONE broadcast join against the edge list
    # instead of two (rank side + degree side) — same rank/outdeg
    # doubles into the same grid floor, join count halved. outdeg is
    # NULL only for sink-only nodes, which never match as `src`.
    nodes_deg = nodes.join(
        outdeg.withColumnRenamed("src", "node"), "node", "left"
    ).localCheckpoint(eager=False)
    state = nodes_deg.select(
        "node", F.lit(1.0 / n).alias("rank"), "outdeg"
    )
    teleport = (1.0 - damping) / n
    # rank/outdeg state is 3 small columns x |V|: broadcast it while it
    # fits (size-conditional — a web-scale |V| falls back to shuffled
    # joins rather than forcing an OOM broadcast)
    small = n <= broadcast_max_nodes
    for it in range(iterations):
        rank_side = F.broadcast(state) if small else state
        contribs = (
            edges.join(rank_side, edges["src"] == rank_side["node"])
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("rank") / F.col("outdeg") * F.lit(GRID) + F.lit(0.5))
                .cast("bigint")
                .alias("c"),
            )
        )
        summed = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        if small:
            summed = F.broadcast(summed)
        # left-join back onto the full node set: a node with no
        # in-edges keeps its teleport rank instead of silently
        # vanishing from the state after the first iteration
        state = nodes_deg.join(summed, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping)
                * (F.coalesce(F.col("s"), F.lit(0)) / F.lit(GRID))
            ).alias("rank"),
            "outdeg",
        )
        # Cut lineage every iteration by default: the small path
        # broadcasts rank_side via an EXPLICIT hint, so the stats loss
        # a checkpoint causes cannot downgrade that join, and the
        # shorter plan measured 17% faster at sf0.1 (2.23 s vs 2.71 s,
        # bitwise-identical ranks). On the big-graph path (no hint)
        # a caller can raise checkpoint_every to keep AQE's sizing
        # information across iterations.
        if (it + 1) % checkpoint_every == 0 and (it + 1) < iterations:
            state = state.localCheckpoint(eager=False)
    return state.select("node", "rank")


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count by DEGREE-ORDERED edge orientation (the
    MapReduce triangle algorithm of Suri & Vassilvitskii WWW'11):
    orient every undirected edge from its lower-(degree, id) endpoint
    to the higher one, enumerate wedges by joining out-edges on their
    shared source, and close each wedge with a semi-join back to the
    oriented edge set.

    Why degree order matters at scale: wedge count is Σ out-deg², and
    orientation caps every node's out-degree at O(√|E|) — a hub that
    would emit deg² wedges under naive enumeration ranks HIGH in the
    order and therefore RECEIVES its edges instead of emitting them.
    The count itself is orientation-invariant (any total order counts
    each triangle exactly once at its lowest vertex), which is what
    lets an id-ordered oracle check this degree-ordered plan — same
    answer, skew-resistant shuffle.

    Returns one row: (n_nodes, n_edges, n_triangles), all BIGINT.
    Ties in degree break by node id; node ids must lie in [0, 2^32)
    (the (degree, id) order is packed into one BIGINT key) — enforced
    in-plan with a cheap bounds check, not just documented.
    """
    # und/oriented are each consumed by several downstream branches
    # (degree agg, key joins, BOTH wedge sides, the closing semi-join,
    # the edge count) — materialize them ONCE or every branch re-derives
    # the upstream self-join, the same uncut-lineage blowup the
    # Bradley-Terry loop hit (solo decade before/after: 14.3 s -> ~1 s
    # at sf0.1). localCheckpoint blocks are GC-owned; O(|E|) storage,
    # the same cost class connected_components pays for its edge cache.
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # The (degree, id) total order is packed into ONE bigint key as
    # d * 2^32 + n, which is only a valid order when 0 <= n < 2^32 —
    # outside that range keys collide/invert and triangles miscount
    # SILENTLY. Enforce the contract in-plan: one min/max agg over the
    # already-checkpointed edge list (a <= b per row, so min(a)/max(b)
    # are the global id bounds; map-side partials, no shuffle weight).
    bounds = und.agg(F.min("a").alias("_lo"), F.max("b").alias("_hi")).head()
    if bounds["_lo"] is not None and (
        int(bounds["_lo"]) < 0 or int(bounds["_hi"]) >= 1 << 32
    ):
        raise ValueError(
            "triangle_count requires node ids in [0, 2^32) for the "
            f"packed (degree, id) order; got range "
            f"[{bounds['_lo']}, {bounds['_hi']}]"
        )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    key = F.col("d") * F.lit(1 << 32).cast("bigint") + F.col("n")
    ka = deg.select(F.col("n").alias("a"), key.alias("ka"))
    kb = deg.select(F.col("n").alias("b"), key.alias("kb"))
    e = und.join(ka, "a").join(kb, "b")
    lower = F.col("ka") < F.col("kb")
    oriented = e.select(
        F.when(lower, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower, F.col("kb")).otherwise(F.col("ka")).alias("kv"),
    ).localCheckpoint(eager=True)
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u")) & (F.col("o1.kv") < F.col("o2.kv")),
    ).select(F.col("o1.v").alias("wv"), F.col("o2.v").alias("ww"))
    closed = wedges.join(
        oriented.select(F.col("u").alias("wv"), F.col("v").alias("ww")),
        ["wv", "ww"],
        "left_semi",
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    n_edges = und.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    n_tri = closed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    return n_nodes.crossJoin(n_edges).crossJoin(n_tri)


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round k-core peeling: repeatedly drop nodes whose degree in
    the surviving subgraph is below ``k``. ``rounds`` is fixed (not
    run-to-convergence) so the semantics are deterministic and an
    UNROLLED SQL oracle can replay them exactly — the ds_bfs_hops /
    pagerank oracle discipline. Equals the true k-core whenever the
    peel converges within ``rounds`` (peeling is monotone: the alive
    set only shrinks).

    Per round: one degree aggregation over the alive-restricted edge
    set (two semi-join-shaped joins against the ≤|V|-row alive frame)
    + the threshold filter — one shuffle per round, the same cost class
    as a PageRank iteration. The alive frame feeds BOTH endpoint joins
    of the next round, so it is localCheckpoint'ed each round (the
    Bradley-Terry two-reference lineage rule). Returns the survivors
    after the final round with their in-subgraph degree:
    (node, degree).
    """
    if rounds < 1:
        raise ValueError(f"kcore_peel requires rounds >= 1, got {rounds}")
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    alive = (
        und.select(F.col("a").alias("n"))
        .union(und.select(F.col("b").alias("n")))
        .distinct()
    )
    deg = None
    for _ in range(rounds):
        alive = alive.localCheckpoint(eager=True)
        e = (
            und.join(alive.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(alive.withColumnRenamed("n", "b"), "b", "left_semi")
        )
        deg = (
            e.select(F.col("a").alias("n"))
            .unionAll(e.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        )
        alive = deg.filter(F.col("d") >= k).select("n")
    return deg.filter(F.col("d") >= k).select(
        F.col("n").alias("node"), F.col("d").alias("degree")
    )


def bfs_hops(
    edges: DataFrame,
    seeds: list[str],
    max_hops: int = 3,
    broadcast_max_frontier: int = 5_000_000,
) -> DataFrame:
    """Hop distance from a seed set: frontier-expansion BFS as a
    DataFrame loop. Returns ``(node, hop)`` with the MINIMUM hop count
    (<= max_hops) for every reachable node.

    Per hop: frontier⋈edges (frontier side broadcast while small —
    size-conditional like :func:`pagerank`'s rank state), distinct new
    nodes, anti-join against visited. Visited grows monotonically; at
    web scale partition it by node so the anti join prunes, and spill
    the per-hop output instead of accumulating a driver-side union.
    All arithmetic is integer — trivially engine-exact.
    """
    spark = edges.sparkSession
    seed_set = sorted(set(seeds))  # dedupe: one (node, 0) row per seed
    if not seed_set:
        # createDataFrame([]) cannot infer a schema — empty seeds is a
        # well-defined query (nothing reachable), return an empty frame.
        # Match the NON-empty branch's resulting type exactly: there the
        # frontier comes from createDataFrame over Python seed values
        # (ints infer LongType) and the union with edge endpoints widens
        # any narrower integer key to LONG — so integral src types map
        # to LongType here too, other types pass through (r5 ADVICE,
        # sharpened by the r7 review).
        from pyspark.sql.types import (
            ByteType,
            IntegerType,
            LongType,
            ShortType,
            StructField,
            StructType,
        )

        node_type = edges.schema["src"].dataType
        if isinstance(node_type, (ByteType, ShortType, IntegerType)):
            node_type = LongType()
        schema = StructType(
            [
                StructField("node", node_type),
                StructField("hop", IntegerType()),
            ]
        )
        return spark.createDataFrame([], schema)
    frontier = spark.createDataFrame(
        [(s,) for s in seed_set], ["node"]
    ).withColumn("hop", F.lit(0))
    visited = frontier
    frontier_size = len(seed_set)
    for hop in range(1, max_hops + 1):
        if frontier_size == 0:
            break  # graph exhausted before max_hops
        fr = (
            F.broadcast(frontier)
            if frontier_size <= broadcast_max_frontier
            else frontier
        )
        nxt = (
            edges.join(fr, edges["src"] == fr["node"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(hop))
        ).localCheckpoint()  # materialize: reused as frontier AND visited
        visited = visited.unionByName(nxt)
        frontier = nxt
        # the count is free on the checkpointed frame and doubles as the
        # early-exit test and next hop's broadcast decision
        frontier_size = nxt.count()
    return visited
