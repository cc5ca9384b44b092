"""connected_components unit tests on adversarial graph shapes (the
oracle-gated query covers real LSH pair data; these cover topology)."""

from __future__ import annotations

from etl_8million_data__spark.operators.graph import connected_components


def _cc(spark, nodes, edges):
    ndf = spark.createDataFrame([(n,) for n in nodes], "node bigint")
    edf = spark.createDataFrame(edges or [(None, None)], "src bigint, dst bigint")
    if not edges:
        edf = edf.filter("src IS NOT NULL")
    got = connected_components(ndf, edf)
    return {r.node: r.component for r in got.collect()}


def test_chain_graph_worst_case_diameter(spark):
    # path 0-1-2-...-15 converges to min label 0 despite diameter 15
    nodes = list(range(16)) + [99]  # 99 isolated
    edges = [(i, i + 1) for i in range(15)]
    comp = _cc(spark, nodes, edges)
    assert all(comp[i] == 0 for i in range(16))
    assert comp[99] == 99


def test_two_cliques_and_orientation_independence(spark):
    nodes = list(range(8))
    # clique A: 0-3 (edges given forward), clique B: 4-7 (edges reversed)
    edges = [(0, 1), (1, 2), (2, 3), (7, 6), (6, 5), (5, 4)]
    comp = _cc(spark, nodes, edges)
    assert {comp[i] for i in range(4)} == {0}
    assert {comp[i] for i in range(4, 8)} == {4}


def test_no_edges_all_singletons(spark):
    comp = _cc(spark, [3, 7, 11], [])
    assert comp == {3: 3, 7: 7, 11: 11}


def test_nonconvergence_raises_instead_of_wrong_labels(spark):
    """A diameter beyond max_iter must raise, never return silently
    incorrect labels."""
    import pytest

    nodes = list(range(8))
    edges = [(i, i + 1) for i in range(7)]  # path graph, diameter 7
    ndf = spark.createDataFrame([(n,) for n in nodes], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(ndf, edf, max_iter=2)
    # and a sufficient budget still converges on the same graph
    got = connected_components(ndf, edf, max_iter=10)
    assert {r.component for r in got.collect()} == {0}


def _cc_star(spark, nodes, edges):
    from etl_8million_data__spark.operators.graph import connected_components_star

    ndf = spark.createDataFrame([(n,) for n in nodes], "node bigint")
    edf = spark.createDataFrame(edges or [(None, None)], "src bigint, dst bigint")
    if not edges:
        edf = edf.filter("src IS NOT NULL")
    got = connected_components_star(ndf, edf)
    return {r.node: r.component for r in got.collect()}


def test_star_long_chain_beyond_label_propagation_budget(spark):
    """A 100-node path has diameter 99 — min-label at default max_iter
    would need 99 rounds; large-star/small-star converges in O(log n)."""
    n = 100
    nodes = list(range(n))
    edges = [(i, i + 1) for i in range(n - 1)]
    comp = _cc_star(spark, nodes, edges)
    assert all(comp[i] == 0 for i in range(n))


def test_star_matches_min_label_on_mixed_topology(spark):
    nodes = list(range(20)) + [50, 51]
    edges = (
        [(0, 1), (1, 2), (2, 3)]          # path
        + [(4, 5), (5, 6), (4, 6)]        # triangle
        + [(9, 8), (8, 7)]                # reversed path
        + [(10, 11), (12, 11), (13, 10)]  # small tree
        + [(14, 19), (19, 15), (15, 18), (18, 16), (16, 17)]  # zigzag
    )
    assert _cc_star(spark, nodes, edges) == _cc(spark, nodes, edges)


def test_star_no_edges_and_isolated(spark):
    comp = _cc_star(spark, [2, 9], [])
    assert comp == {2: 2, 9: 9}


def test_pagerank_matches_python_reference(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from etl_8million_data__spark.operators.graph import pagerank_weighted

    edges = [("a", "b", 3), ("b", "c", 1), ("c", "a", 2), ("a", "c", 1), ("d", "a", 5)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r.node: r.rank_fixed for r in pagerank_weighted(df, n_iter=3).collect()}

    # pure-python mirror of the integer fixed-point iteration
    scale, d_num, d_den = 1_000_000_000, 85, 100
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    out_w = {}
    for u, _, w in edges:
        out_w[u] = out_w.get(u, 0) + w
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    teleport = ((d_den - d_num) * scale // d_den) // n
    for _ in range(3):
        inflow = {v: 0 for v in nodes}
        for u, v, w in edges:
            inflow[v] += ((d_num * r[u]) * w) // (d_den * out_w[u])
        r = {v: teleport + inflow[v] for v in nodes}
    assert got == r
    # dangling node 'd' keeps only teleport mass
    assert got["d"] == teleport


def test_triangle_counts_reference(spark):
    from etl_8million_data__spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus pendant 5
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = {r.node: (r.degree, r.n_triangles, r.clustering)
            for r in triangle_counts(df).collect()}
    for v in (1, 2, 3):
        assert rows[v][:2] == (3, 3) and rows[v][2] == 1.0
    assert rows[4][:2] == (4, 3) and rows[4][2] == 0.5
    assert rows[5] == (1, 0, None)


def _kcore(spark, edges, k=2, rounds=8):
    from etl_8million_data__spark.operators.graph import kcore_nodes

    edf = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    got = kcore_nodes(edf, k=k, rounds=rounds)
    return {r.node: r.core_degree for r in got.collect()}


def test_kcore_triangle_with_tail(spark):
    """A triangle with a pendant chain: the chain peels away round by
    round, the triangle survives as the entire 2-core."""
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
    assert _kcore(spark, edges) == {1: 2, 2: 2, 3: 2}


def test_kcore_pure_chain_empties(spark):
    """A chain has no 2-core at all — transitive closure would fuse it
    into one component; k-core correctly reports nothing collapsible."""
    assert _kcore(spark, [(i, i + 1) for i in range(1, 7)]) == {}


def test_kcore_cascade_peeling_needs_multiple_rounds(spark):
    """Removing a degree-1 node can demote its neighbor below k: a
    clique with a chain whose head hangs off a clique member requires
    cascading rounds (each round peels one chain link)."""
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 10), (10, 11), (11, 12), (12, 13)]
    got = _kcore(spark, clique + chain)
    assert set(got) == {1, 2, 3, 4}
    assert got[1] == 3 and got[4] == 3


def test_kcore_k3_distinguishes_diamond_from_clique(spark):
    """k=3: a 4-clique survives, a diamond (4-cycle + one chord) does
    not — the two off-chord nodes have degree 2 and peel, which then
    demotes the rest."""
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    diamond = [(5, 6), (6, 7), (7, 8), (8, 5), (5, 7)]
    got = _kcore(spark, clique + diamond, k=3)
    assert set(got) == {1, 2, 3, 4}


def test_kcore_fixture_graph_converges_within_round_budget(spark, sf_dir):
    """The registered query's 8-round budget must be a fixpoint on the
    fixture LSH graphs: a 9th round removes nothing (so the bounded
    unrolled oracle equals the true k-core here, not a truncation)."""
    from etl_8million_data__spark.catalog import load_table
    from etl_8million_data__spark.operators.dedup import minhash_lsh_candidate_pairs
    from etl_8million_data__spark.operators.graph import kcore_nodes

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidate_pairs(d).localCheckpoint(eager=True)
    r8 = {
        (r.node, r.core_degree) for r in kcore_nodes(pairs, 2, 8).collect()
    }
    r9 = {
        (r.node, r.core_degree) for r in kcore_nodes(pairs, 2, 9).collect()
    }
    assert r8 == r9
    assert r8, "fixture should contain a non-trivial 2-core"


def test_kcore_matches_python_peeling_on_random_graphs(spark):
    """Property: on md5-deterministic random graphs, kcore_nodes'
    bounded-round peel must equal a pure-python peel run to FIXPOINT
    (the rounds budget is generous enough for these sizes), for several
    k values — the relational loop is checked against independent
    reference semantics, not just hand-picked topologies."""
    import hashlib

    def rnd_edges(seed, n_nodes, n_edges):
        out = set()
        i = 0
        while len(out) < n_edges:
            h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
            a = int(h[:8], 16) % n_nodes
            b = int(h[8:16], 16) % n_nodes
            i += 1
            if a != b:
                out.add((min(a, b), max(a, b)))
        return sorted(out)

    def py_kcore(edges, k):
        from collections import defaultdict

        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        changed = True
        while changed:
            changed = False
            for n in list(adj):
                if len(adj[n]) < k:
                    for m in adj[n]:
                        adj[m].discard(n)
                    del adj[n]
                    changed = True
        return {n: len(vs) for n, vs in adj.items() if len(vs) >= k}

    from etl_8million_data__spark.operators.graph import kcore_nodes

    for seed, n_nodes, n_edges, k in [
        (1, 30, 45, 2),
        (2, 25, 60, 3),
        (3, 40, 50, 2),
    ]:
        edges = rnd_edges(seed, n_nodes, n_edges)
        edf = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
        got = {
            r.node: r.core_degree
            for r in kcore_nodes(edf, k=k, rounds=20).collect()
        }
        assert got == py_kcore(edges, k), (seed, k)
