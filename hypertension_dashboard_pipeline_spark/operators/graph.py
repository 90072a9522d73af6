"""Iterative graph algorithms expressed as DataFrame fixed-point loops.

``connected_components`` (operators/dedup.py) handles the dedup-family
use case; this module adds weighted PageRank — the standard importance
measure over transition / citation / link graphs (here: the event-type
transition graph, but the operator is generic over any weighted edge
list).

Spark-first design: each iteration is ONE broadcast-or-shuffle join of
the current rank vector against the normalized edge list plus one
groupBy — the classic "Pregel step as join+agg" formulation.  The edge
list is normalized (out-weight sums to 1 per source) once, up front,
and persisted by the caller if iterating many times; ranks stay a
DataFrame throughout (no driver-side vectors), so the same loop runs
on a 5-node event-type graph and a billion-node web graph.  Dangling
nodes (no out-edges) redistribute their mass uniformly, keeping the
rank vector a probability distribution — the textbook correction, done
with a 1-row aggregate crossJoin rather than a driver collect.

Lineage: 4–20 iterations of join+agg is shallow enough for plain lazy
evaluation; past ~25 rounds callers should `localCheckpoint` the rank
vector every few iterations (same trade documented for
connected_components, operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# loop-invariant subplans persisted by pagerank(); callers (bench, the
# registry runner) release them via release_persisted() — same contract
# as operators/dedup.py
_PERSISTED: list[DataFrame] = []


def release_persisted() -> None:
    """Unpersist every intermediate persisted by a prior pagerank call.
    Idempotent; safe mid-plan (consumers recompute)."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()


def normalize_edges(edges: DataFrame, src: str = "src", dst: str = "dst",
                    weight: str = "w") -> DataFrame:
    """Per-source transition probabilities: w / sum(w) over src."""
    outw = edges.groupBy(src).agg(F.sum(weight).alias("_tw"))
    return (
        edges.join(outw, src)
        .select(src, dst, (F.col(weight).cast("double") / F.col("_tw")).alias("p"))
    )


def _pagerank_local(en: DataFrame, iterations: int,
                    damping: float) -> DataFrame | None:
    """Driver-side fast path over a collected normalized edge list (the
    ``pagerank`` small-graph short-circuit — same move as
    ``connected_components``' union-find fast path).  Returns None when
    the edge list contains NULL endpoints: SQL join semantics around
    NULL keys (never equal, yet a groupable value) are exactly the kind
    of thing a dict-keyed reimplementation gets subtly wrong, so those
    graphs take the distributed loop.

    Per-node incoming sums accumulate in sorted (src, dst) edge order
    and the dangling mass in sorted node order — a fixed permutation of
    the same IEEE double additions the distributed loop performs in
    partition order (and the SQL oracle in its own order); registered
    consumers round to >= 4 dp, where permutation effects are
    invisible (the same tolerance class the distributed loop already
    relies on, verified by the determinism sweep).  Python float ops
    ARE IEEE-754 doubles, identical to the JVM's."""
    from pyspark.sql import types as T

    src, dst = en.columns[0], en.columns[1]  # normalize_edges order
    pdf = en.toPandas()  # (src, dst, p) — tiny by the caller's gate
    if (pdf[src].isna().any() or pdf[dst].isna().any()
            or pdf["p"].isna().any()):
        # NULL endpoints (SQL join-vs-group semantics) or NULL weights
        # (SUM skips nulls; a dict fold would propagate NaN): defer to
        # the distributed loop, whose semantics are the contract
        return None
    edges_l = sorted(zip(pdf[src].tolist(), pdf[dst].tolist(),
                         pdf["p"].tolist()))
    nodes = sorted({e[0] for e in edges_l} | {e[1] for e in edges_l})
    srcs = {e[0] for e in edges_l}
    n = len(nodes)
    if n == 0:
        schema = T.StructType(
            [T.StructField("v", en.schema[src].dataType, True),
             T.StructField("rank", T.DoubleType(), True)]
        )
        return en.sparkSession.createDataFrame([], schema)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dm = 0.0
        for v in nodes:
            if v not in srcs:
                dm = dm + rank[v]
        inc: dict = {}
        for s, d, p in edges_l:
            inc[d] = inc.get(d, 0.0) + rank[s] * p
        rank = {
            v: (1.0 - damping) / n
            + damping * (inc.get(v, 0.0) + dm / n)
            for v in nodes
        }
    schema = T.StructType(
        [T.StructField("v", en.schema[src].dataType, True),
         T.StructField("rank", T.DoubleType(), True)]
    )
    return en.sparkSession.createDataFrame(
        [(v, rank[v]) for v in nodes], schema
    )


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             weight: str = "w", iterations: int = 4,
             damping: float = 0.85,
             small_graph_threshold: int = 100_000) -> DataFrame:
    """Weighted PageRank over an edge list; returns (v, rank).

    rank_{t+1}(v) = (1-d)/N + d * [ sum_{u->v} rank_t(u) * p(u,v)
                                    + dangling_mass_t / N ]

    Exact closed form each iteration (no early-exit tolerance), so an
    unrolled-SQL oracle reproduces it bit-for-bit modulo float
    summation order.

    **Small-graph fast path** (r13 optimization): aggregated transition
    graphs are tiny relative to their corpus — the event-type graph has
    |event types|² edges at most, regardless of event count.  When the
    normalized edge list holds at most ``small_graph_threshold`` rows
    (~24 B/edge via Arrow — a few MB at the default), it is collected
    and iterated driver-side: ONE job instead of `iterations` rounds of
    checkpoint jobs (measured 3.6 s → ~0.6 s at sf0.1 for the
    transition query; the per-round join/checkpoint machinery was all
    fixed overhead at this graph size).  Identical contract — values
    equal within the >= 4 dp rounding every registered consumer
    applies, same float-permutation tolerance class as the distributed
    loop itself (tests pin fast-vs-distributed equality at 6 dp);
    graphs above the threshold, or with NULL endpoints, take the
    distributed loop automatically.  Set ``small_graph_threshold=0`` to
    force the distributed loop (tests do).

    Iteration mechanics (distributed loop): each round references the
    rank vector from THREE subtrees (dangling mass, incoming mass, and
    the rebuild), so a fully-lazy loop grows the plan ~3^iterations —
    measured 5.6s of mostly optimizer time for 4 rounds on a 5-node
    graph.  The rank vector is therefore localCheckpoint'ed per round
    (LAZY since r13: the plan truncation is what matters — an eager
    checkpoint paid one extra driver round-trip per iteration for
    nothing; measured 3.59 s → 3.04 s) and the loop-invariant edge/node
    derivations are persisted once so they aren't recomputed every
    round (the honest floor for an iterative algorithm; at real scale
    the per-round join cost dominates it).
    """
    release_persisted()  # drop a prior call's loop invariants
    en = normalize_edges(edges, src, dst, weight).persist()
    _PERSISTED.append(en)

    if small_graph_threshold > 0:
        # the count also materializes the persisted edges, so the
        # distributed fallback (or the fast path's collect) reads cache
        if en.count() <= small_graph_threshold:
            local = _pagerank_local(en, iterations, damping)
            if local is not None:
                return local
    nodes = (
        edges.select(F.col(src).alias("v"))
        .union(edges.select(F.col(dst).alias("v")))
        .distinct()
        .persist()
    )
    _PERSISTED.append(nodes)
    n_nodes = nodes.agg(F.count("*").alias("n"))  # 1-row side, broadcast
    dangling = nodes.join(
        edges.select(F.col(src).alias("v")).distinct(), "v", "left_anti"
    ).persist()
    _PERSISTED.append(dangling)

    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "v", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(iterations):
        ranks = ranks.localCheckpoint(eager=False)
        # dangling can be O(nodes) on real graphs — no forced broadcast,
        # AQE sizes the semi-join side at runtime
        dmass = (
            ranks.join(dangling, "v", "semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        incoming = (
            en.join(ranks.withColumnRenamed("v", src), src)
            .groupBy(F.col(dst).alias("v"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("inc"))
        )
        ranks = (
            nodes.join(incoming, "v", "left")
            .crossJoin(F.broadcast(n_nodes))
            .crossJoin(F.broadcast(dmass))
            .select(
                "v",
                (
                    (1.0 - damping) / F.col("n")
                    + damping
                    * (F.coalesce(F.col("inc"), F.lit(0.0)) + F.col("dm") / F.col("n"))
                ).alias("rank"),
            )
        )
    return ranks


def triangle_stats(edges: DataFrame, a_col: str = "a",
                   b_col: str = "b", scale: int = 6) -> DataFrame:
    """Global triangle count, wedge count, and clustering coefficient
    over an undirected simple graph (edges given once, any orientation;
    self-loops and duplicates removed here).

    Triangle enumeration uses the degree-ordered edge-iterator (the
    compact-forward / node-iterator++ algorithm — Schank & Wagner '05,
    Suri & Vassilvitskii WWW'11 "Counting Triangles and the Curse of
    the Last Reducer" — public literature): every edge is oriented
    from the (degree, id)-SMALLER endpoint to the larger, wedges are
    built only from each vertex's OUT-edges, and a wedge closes iff
    its far pair is itself an oriented edge.  Each triangle appears
    exactly once (its unique degree-minimal vertex pivots it), and the
    pivot's out-degree is bounded by O(sqrt(m)) — the hot celebrity
    vertex that makes the naive a<b<c self-join explode contributes
    wedges only through its (few) lower-degree neighbors, which is
    precisely the 100 TB skew guard.

    Wedge count (open+closed paths of length 2) = Σ_v C(deg(v), 2)
    from the degree table alone; global clustering = 3·T / W, floor-
    rounded; NULL when the graph has no wedges.

    Deliberately NOT persisted: ``und`` feeds four consumers and
    ``fwd`` two, but every consumer sits behind the same shuffle
    boundaries and AQE's runtime exchange reuse computes each shared
    exchange once (9 ReusedExchange nodes in the executed sf0.01
    plan).  An explicit ``.persist()`` on both frames was measured
    STRICTLY SLOWER (sf0.01: 2.31s -> 3.14s; sf0.1: 8.75s -> 9.19s,
    same VM, best-of-2) — block-store writes plus broken whole-stage
    pipelines cost more than the zero recomputation they would save
    (SCALING.md r7 triangle note).
    """
    und = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("x"))
        .unionAll(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient each edge from (deg, id)-smaller to larger endpoint
    withdeg = (
        und.join(deg.select(F.col("x").alias("u"),
                            F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("x").alias("v"),
                         F.col("deg").alias("dv")), "v")
    )
    fwd = withdeg.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
        )
        .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("d")))
        .alias("e")
    ).select("e.s", "e.d")

    wedge = (
        fwd.alias("e1")
        .join(fwd.alias("e2"),
              (F.col("e1.s") == F.col("e2.s"))
              & (F.col("e1.d") < F.col("e2.d")))
        .select(F.col("e1.d").alias("w1"), F.col("e2.d").alias("w2"))
    )
    # a wedge (w1, w2) closes iff w1->w2 or w2->w1 is an oriented edge;
    # normalize the probe to the canonical (min, max) form instead
    closed = wedge.join(
        und,
        (F.least(F.col("w1"), F.col("w2")) == F.col("u"))
        & (F.greatest(F.col("w1"), F.col("w2")) == F.col("v")),
        "left_semi",
    )
    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
        .cast("long")
        .alias("n_wedges")
    )
    from ..functions.expressions import round_fixed

    return (
        tri.crossJoin(wedges)  # two 1-row aggregates
        .select(
            "n_triangles",
            "n_wedges",
            F.when(
                F.col("n_wedges") > 0,
                round_fixed(
                    F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"),
                    scale,
                ),
            ).alias("global_clustering"),
        )
    )


def kcore(edges: DataFrame, k: int, a_col: str = "a", b_col: str = "b",
          max_iter: int = 50) -> DataFrame:
    """k-core decomposition for a FIXED k (Seidman '83; the standard
    iterative-peeling algorithm, e.g. Batagelj & Zaveršnik '03 —
    public literature): repeatedly remove every vertex of degree < k
    until none remains; the surviving induced subgraph is the k-core.
    Cores locate the dense nucleus near-dup/spam clusters form in
    similarity graphs, at a fraction of triangle counting's cost.

    Plan per round: ONE degree aggregation over the live edge list +
    a double semi-join (both endpoints must survive).  The edge list
    shrinks monotonically, so iteration cost falls every round;
    ``localCheckpoint`` between rounds truncates the growing lineage
    exactly as ``pagerank`` does, and the loop exits when a round
    removes no edges (count is the same action that materializes the
    checkpoint — no extra job).  Rounds needed = peeling depth, which
    is small for real graphs (the degeneracy ordering removes whole
    shells at a time, not single vertices).

    Returns (vertex, degree) — the induced-subgraph degree within the
    k-core; empty when the graph has no k-core.
    """
    und = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    live = und
    n_edges = live.count()
    for _ in range(max_iter):
        if n_edges == 0:
            break
        deg = (
            live.select(F.col("u").alias("x"))
            .unionAll(live.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("x")
        nxt = (
            live.join(keep.withColumnRenamed("x", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("x", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        if n_next == n_edges:
            break
        live, n_edges = nxt, n_next
    else:
        import warnings

        warnings.warn(
            f"kcore did not converge within {max_iter} rounds",
            stacklevel=2,
        )
    return (
        live.select(F.col("u").alias("x"))
        .unionAll(live.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.col("x").alias("vertex"), "degree")
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007), deterministic variant: labels start as node ids; each
    round every node adopts the most frequent label among its
    neighbors, ties broken toward the SMALLEST label; fixed iteration
    count (async/random-order LPA is irreproducible — the synchronous
    min-tie form is what an engine can oracle-check).

    ``edges`` must be symmetric (both directions present).  Per
    round: one join of edges to current labels on the neighbor key,
    one (node, label) count, one per-node window argmax — every step
    keyed on the node id, so a cluster runs each round as one
    co-partitioned shuffle; label skew (giant communities) never
    concentrates work because counting is per (node, label), bounded
    by each node's degree.

    Returns per-node ``(node, community)`` — callers aggregate.
    """
    from pyspark.sql import Window

    nodes = edges.select(F.col(src).alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("lbl"))
    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("lbl")
    )
    for _ in range(iterations):
        neigh = (
            edges.join(
                labels.select(
                    F.col("node").alias("nb"), F.col("lbl")
                ),
                F.col(dst) == F.col("nb"),
            )
            .groupBy(F.col(src).alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            neigh.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
        )
    return labels.select("node", F.col("lbl").alias("community"))
