"""Distributed connected components via iterative min-label propagation.

Used to turn near-duplicate *pairs* (LSH output) into duplicate
*clusters*: every document gets the minimum doc_id reachable through the
similarity graph as its component/canonical id.

Scale notes: each iteration is one shuffle (join on src + groupBy min),
and the iteration count is the graph diameter — near-dup graphs are
overwhelmingly tiny cliques, so this converges in 2-4 rounds.
``localCheckpoint`` truncates the lineage each round so plans don't grow
unboundedly. For adversarially-long chain graphs the classic
large-star/small-star variant halves the diameter per round; not needed
for dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``nodes``: one row per vertex (isolated vertices become their own
    singleton component). ``edges``: undirected pairs (either
    orientation; both directions are added internally).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    ).localCheckpoint(eager=True)

    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    changed = 0
    for _ in range(max_iter):
        # A node's new label: min of its own and all neighbours' labels.
        # ONE job per iteration: the old label rides along into the
        # lazily-checkpointed frame and the convergence check's full
        # count is the action that materializes it (the round-12
        # delta-door job-fusion discipline — the previous shape paid a
        # separate eager-checkpoint job plus a changed-count job).
        nbr = labels.join(e, labels.node == e.src).select(
            F.col("dst").alias("node"), F.col("label")
        )
        merged = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .join(labels.select("node", F.col("label").alias("_old")), "node")
            .localCheckpoint(eager=False)
        )
        changed = merged.filter(F.col("label") != F.col("_old")).count()
        labels = merged.select("node", "label")
        if changed == 0:
            break
    if changed != 0:
        # Exiting here would hand back silently-wrong labels for any
        # graph whose diameter exceeds max_iter.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "iterations (graph diameter too large for min-label propagation); "
            "raise max_iter or use a large-star/small-star variant"
        )
    return labels.select("node", F.col("label").alias("component"))


def _canonical(pairs: DataFrame) -> DataFrame:
    """Distinct undirected edges as (a, b) with a < b; self-loops dropped."""
    return (
        pairs.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    O(log n) rounds regardless of graph diameter, unlike min-label
    propagation's O(diameter).  Use this form when near-dup graphs can
    chain (templated/boilerplate corpora produce long A~B~C~… paths);
    `connected_components` stays the cheaper choice for clique-shaped
    graphs.

    Per round: large-star hangs every larger neighbor of u onto u's
    minimum (one groupBy-min + one join), small-star re-hangs smaller
    neighbors the same way on the larger-endpoint orientation.  Edges
    converge to stars rooted at each component's minimum id; the label
    read-off is then one aggregate.  Returns (node, component) with
    component = min reachable id — identical output contract to
    `connected_components`.
    """
    e0 = _canonical(
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    ).localCheckpoint(eager=True)
    cur = e0
    n_edges = cur.count()
    if n_edges > 0:
        converged = False
        for _ in range(max_iter):
            # large-star over full adjacency: m(u) = min(u, N(u));
            # every neighbor v > u re-attaches to m(u).
            both = cur.union(cur.select(F.col("b").alias("a"), F.col("a").alias("b")))
            m_ls = both.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
            ls = (
                both.filter(F.col("b") > F.col("a"))
                .join(m_ls, "a")
                .select(F.col("b").alias("a"), F.col("m").alias("b"))
            )
            # small-star on the (hi -> lo) orientation: all neighbors of
            # the larger endpoint (plus itself) re-attach to its minimum.
            d = _canonical(ls).select(F.col("b").alias("u"), F.col("a").alias("v"))
            m_ss = d.groupBy("u").agg(F.min("v").alias("m"))
            ss = (
                d.join(m_ss, "u")
                .select(F.col("v").alias("a"), F.col("m").alias("b"))
                .union(m_ss.select(F.col("u").alias("a"), F.col("m").alias("b")))
            )
            nxt = _canonical(ss).localCheckpoint(eager=True)
            n_nxt = nxt.count()
            if n_nxt == n_edges and nxt.exceptAll(cur).limit(1).count() == 0:
                cur = nxt
                converged = True
                break
            cur, n_edges = nxt, n_nxt
        if not converged:
            raise RuntimeError(
                f"connected_components_star did not converge within "
                f"max_iter={max_iter} rounds"
            )
    # Star read-off: every node's component is min(self, neighbors).
    nbr_min = (
        cur.union(cur.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .groupBy("a")
        .agg(F.min("b").alias("nmin"))
        .select(F.col("a").alias("node"), "nmin")
    )
    return (
        nodes.select(F.col(node_col).alias("node"))
        .join(nbr_min, "node", "left")
        .select(
            "node",
            F.least(F.col("node"), F.coalesce("nmin", F.col("node"))).alias("component"),
        )
    )


def triangle_counts(pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b") -> DataFrame:
    """Per-node triangle counts over an undirected edge list, via
    DEGREE-ORDERED ORIENTATION — the standard distributed-triangle
    technique: direct every edge from its lower-(degree, id) endpoint
    to the higher one, so every node's out-degree is bounded by
    O(sqrt(|E|)) and the wedge join (the quadratic step) never fans
    out around a hub the way the naive id-ordered enumeration does.
    Each triangle is counted exactly once (its unique source is the
    ≺-minimum vertex), then attributed to all three corners by an
    explode.  Returns (node, degree, n_triangles, clustering) where
    clustering = 2T / (d(d-1)) (NULL for degree-1 nodes).

    Pure equi-joins on node keys; degrees come from one aggregation of
    the edge list; no iteration, no driver data."""
    e = pairs.select(
        F.col(a_col).alias("u"), F.col(b_col).alias("v")
    ).distinct()
    both = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = both.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    dd = both.join(deg, "u").join(
        deg.select(F.col("u").alias("v"), F.col("deg").alias("deg_v")), "v"
    )
    # orient u -> v iff (deg_u, u) < (deg_v, v)
    oriented = dd.filter(
        (F.col("deg") < F.col("deg_v"))
        | ((F.col("deg") == F.col("deg_v")) & (F.col("u") < F.col("v")))
    ).select("u", "v", F.col("deg_v"))
    o1 = oriented.select("u", F.col("v").alias("b"), F.col("deg_v").alias("deg_b"))
    o2 = oriented.select("u", F.col("v").alias("c"), F.col("deg_v").alias("deg_c"))
    wedges = o1.join(o2, "u").filter(
        (F.col("deg_b") < F.col("deg_c"))
        | ((F.col("deg_b") == F.col("deg_c")) & (F.col("b") < F.col("c")))
    )
    closing = oriented.select(F.col("u").alias("b"), F.col("v").alias("c"))
    tri = wedges.join(closing, ["b", "c"]).select("u", "b", "c")
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    tcount = corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    out = deg.select(F.col("u").alias("node"), "deg").join(tcount, "node", "left")
    n_tri = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint")
    return out.select(
        "node",
        F.col("deg").alias("degree"),
        n_tri.alias("n_triangles"),
        F.when(
            F.col("deg") >= 2,
            n_tri * 2.0 / (F.col("deg") * (F.col("deg") - 1)),
        ).alias("clustering"),
    )


def pagerank_weighted(
    edges: DataFrame,
    n_iter: int = 3,
    d_num: int = 85,
    d_den: int = 100,
    scale: int = 1_000_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
) -> DataFrame:
    """Edge-weighted PageRank as ``n_iter`` unrolled relational power
    iterations in EXACT integer fixed-point: ranks live in
    ``scale``-units and every per-edge contribution is the truncated
    integer division ``(d_num * r_u * w_uv) div (d_den * w_out_u)``,
    so both engines (Spark ``div``, DuckDB ``//`` — both truncate
    toward zero on non-negative operands) produce bit-identical ranks
    with no float accumulation anywhere.  Mass lost to truncation and
    to dangling nodes is simply dropped (ranks are comparable, not a
    probability distribution) — the standard simplification when
    PageRank is used as a RANKING signal.

    Dangling-mass semantics, precisely: a sink node's rank enters no
    contribution join, so each iteration maps total mass M to at most
    teleport_total + (d_num/d_den)·M — a strict L1 contraction with
    factor d (0.85), i.e. the iteration still converges geometrically
    to a unique fixed point; the dropped mass only deflates the total
    (per-node ranks are NOT renormalized to sum to 1, and sinks act as
    pure absorbers rather than teleporting their mass back). This is
    deliberate and SYMMETRIC: the DuckDB oracle replays the identical
    recurrence, so the engines agree bit-for-bit. To get
    distribution-style PageRank instead, redistribute each round's
    dangling mass uniformly (one extra aggregate of sink ranks per
    iteration) on BOTH engines — not done here because the ranking
    order is what the corpus-curation consumers use.

    Each iteration is one join of the rank vector against the edge
    list + one dst-keyed aggregation — the canonical distributed
    PageRank step; the loop is driver-side CONTROL only.  Overflow
    headroom: d_num * scale * max_edge_weight must stay inside int64
    (85 * 1e9 * w: safe for weights to ~1e8)."""
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(w_col).cast("long").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("w_out"))
    ew = e.join(out_w, "src").localCheckpoint(eager=True)
    n = nodes.count()
    base = (1 * scale) // n  # uniform start, truncated like the oracle
    teleport = ((d_den - d_num) * scale // d_den) // n
    r = nodes.select("node", F.lit(base).cast("long").alias("rank"))
    for _ in range(n_iter):
        contrib = (
            ew.join(r.select(F.col("node").alias("src"), "rank"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(({d_num} * rank) * w) div ({d_den} * w_out)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        r = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport).cast("long")
                    + F.coalesce(F.col("inflow"), F.lit(0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return r.withColumnRenamed("rank", "rank_fixed")


def label_propagation_weighted(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    node_col: str = "node",
) -> DataFrame:
    """Weighted label propagation (community detection) as ``n_iter``
    SYNCHRONOUS relational rounds — the community refinement connected
    components can't do: CC fuses everything reachable, LPA lets a
    weakly-bridged cluster keep its own community because each node
    adopts the label with the LARGEST total incident edge weight among
    its neighbors (ties -> smallest label; isolated nodes keep their
    own id). Fixed iteration count + integer weights + the
    (weight DESC, label ASC) total order make every round — and hence
    the whole result — bit-reproducible in any engine, the same
    contract as pagerank_weighted / kmeans_fit.

    Per round: one join of the label vector against the undirected
    edge list, one (node, label) weight sum with map-side partials,
    one per-node argmax window bounded by the node's distinct
    neighbor-label count, then a left join back onto the node set;
    lineage truncated per round. Returns (node, label) after the final
    round."""
    e = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v"),
        F.col(w_col).cast("long").alias("w"),
    )
    und = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    ).localCheckpoint(eager=True)
    lab = nodes.select(F.col(node_col).alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    ).localCheckpoint(eager=True)
    for _ in range(n_iter):
        s = (
            und.join(lab.select(F.col("node").alias("v"), "lbl"), "v")
            .groupBy("u", "lbl")
            .agg(F.sum("w").alias("tw"))
        )
        wr = Window.partitionBy("u").orderBy(F.desc("tw"), F.asc("lbl"))
        best = (
            s.withColumn("_rn", F.row_number().over(wr))
            .filter(F.col("_rn") == 1)
            .select(F.col("u").alias("node"), F.col("lbl").alias("_new"))
        )
        lab = (
            lab.join(best, "node", "left")
            .select("node", F.coalesce("_new", "lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
    return lab


def kcore_nodes(
    pairs: DataFrame,
    k: int = 2,
    rounds: int = 8,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """k-core decomposition by bounded synchronous peeling: ``rounds``
    iterations of "drop every node whose degree in the SURVIVING
    subgraph is < k", returning (node, core_degree) for the survivors.
    The k-core separates tight clone knots (every member ≥ k
    independent near-dup links — safe to collapse to one keeper) from
    the chain periphery that transitive closure would wrongly fuse —
    the structural refinement of the triangle/clustering audit.

    The round count is FIXED (control flow only, like the k-means and
    BPE loops), so the operator is oracle-checkable by unrolling the
    same rounds in SQL; tests assert the fixture graphs converge within
    the bound (an extra round removes nothing), and at 100 TB peeling
    depth beyond 8 means a pathological chain you'd cap anyway —
    each round is one degree hash-aggregate + two semi joins keyed by
    node, lineage truncated per round by localCheckpoint.

    Cite: the reference has no graph surface; this extends the dedup
    family (SURVEY §7.2(4)) like operators/graph.connected_components.
    """
    if k < 1 or rounds < 1:
        raise ValueError("kcore_nodes requires k >= 1 and rounds >= 1")
    und = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")).unionAll(
        pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
    )
    surv = und.localCheckpoint(eager=True)
    for _ in range(rounds):
        keep = (
            surv.groupBy("u")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .filter(F.col("_deg") >= k)
            .select("u")
        )
        surv = (
            surv.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return (
        surv.groupBy("u")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .filter(F.col("core_degree") >= k)
        .select(F.col("u").alias("node"), "core_degree")
    )
