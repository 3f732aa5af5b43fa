"""connected_components / dedup_components: clique, chain, disconnected
groups, undirected symmetry, and the max_iter convergence contract."""

from __future__ import annotations

import pytest

from txf_continuous_data_pipeline_spark.operators.graph import (
    connected_components,
    dedup_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_clique_collapses_to_min_id(spark):
    # 4-clique on {10,11,12,13}: every node labels to 10.
    pairs = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    got = _labels(connected_components(_edges(spark, pairs)))
    assert got == {10: 10, 11: 10, 12: 10, 13: 10}


def test_chain_converges_within_diameter_rounds(spark):
    # 0-1-2-...-7 chain: diameter 7, min-label floods down to 0.
    pairs = [(i, i + 1) for i in range(7)]
    got = _labels(connected_components(_edges(spark, pairs), max_iter=8))
    assert got == {i: 0 for i in range(8)}


def test_disconnected_components_stay_separate(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (20, 21)]
    got = _labels(connected_components(_edges(spark, pairs)))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_edge_direction_is_irrelevant(spark):
    # (b, a) edges with b > a: propagation must still flow both ways.
    fwd = _labels(connected_components(_edges(spark, [(1, 5), (5, 9)])))
    rev = _labels(connected_components(_edges(spark, [(9, 5), (5, 1)])))
    assert fwd == rev == {1: 1, 5: 1, 9: 1}


def test_max_iter_exhaustion_raises_by_default(spark):
    # A 9-hop chain cannot converge in 2 rounds -> strict raises.
    pairs = [(i, i + 1) for i in range(9)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_edges(spark, pairs), max_iter=2)


def test_max_iter_exhaustion_warns_when_not_strict(spark):
    pairs = [(i, i + 1) for i in range(9)]
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(_edges(spark, pairs), max_iter=2, strict=False)


def test_dedup_components_renames_to_doc_id(spark):
    pairs = _edges(spark, [(100, 200), (200, 300)])
    rows = {
        r["doc_id"]: r["component"] for r in dedup_components(pairs).collect()
    }
    assert rows == {100: 100, 200: 100, 300: 100}


def test_stop_shingle_filter_drops_only_hot_shingles(spark):
    from txf_continuous_data_pipeline_spark.operators.dedup import (
        stop_shingle_filter,
    )

    # shingle 'hot' appears in 4 docs, the rest in <= 2
    rows = [(d, "hot") for d in range(4)] + [(0, "a"), (1, "a"), (2, "b")]
    inv = spark.createDataFrame(rows, "doc_id long, shingle string")
    kept = stop_shingle_filter(inv, max_doc_freq=2)
    shingles = {r["shingle"] for r in kept.select("shingle").distinct().collect()}
    assert shingles == {"a", "b"}
    # a permissive cap is the identity
    assert stop_shingle_filter(inv, max_doc_freq=10).count() == inv.count()


def test_random_graph_matches_union_find(spark):
    # Differential against a pure-Python union-find on a seeded random
    # graph: mixed component shapes (cliques, chains, stars, isolated
    # pairs) that no hand-written case enumerates.
    import random

    rng = random.Random(20240813)
    n_nodes, n_edges = 300, 220
    pairs = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {x for ab in pairs for x in ab}
    want = {}
    for x in touched:
        root = find(x)
        group_min = min(y for y in touched if find(y) == root)
        want[x] = group_min

    got = _labels(connected_components(_edges(spark, pairs)))
    assert got == want


def test_adversarial_id_layout_converges_logarithmically(spark):
    # Descending ids along a chain: min-label propagation (the previous
    # implementation here) needs O(n) rounds on this layout because a
    # node's stale label never learns a smaller value to jump through.
    # The star rounds must close a 300-node chain in ~log2(n) rounds.
    pairs = [(300 - i, 300 - i - 1) for i in range(299)]
    stats = {}
    got = _labels(
        connected_components(_edges(spark, pairs), stats=stats)
    )
    assert got == {i: 1 for i in range(1, 301)}
    assert stats["rounds"] <= 12, stats


def test_pagerank_matches_numpy_power_iteration(spark):
    import random

    import numpy as np

    from txf_continuous_data_pipeline_spark.operators.graph import pagerank

    rng = random.Random(42)
    n = 40
    pairs = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(80)
            )
            if a != b
        }
    )
    got = {
        r["id"]: r["rank"]
        for r in pagerank(
            _edges(spark, pairs), damping=0.85, n_iter=10
        ).collect()
    }

    nodes = sorted({x for ab in pairs for x in ab})
    idx = {v: i for i, v in enumerate(nodes)}
    m = len(nodes)
    A = np.zeros((m, m))
    for a, b in pairs:
        A[idx[b], idx[a]] = 1.0
        A[idx[a], idx[b]] = 1.0
    A /= A.sum(axis=0, keepdims=True)
    r = np.full(m, 1.0 / m)
    for _ in range(10):
        r = (1 - 0.85) / m + 0.85 * (A @ r)

    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-12, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_directed_dangling_mass(spark):
    from txf_continuous_data_pipeline_spark.operators.graph import pagerank

    # 1 -> 2 -> 3, node 3 dangling: mass must be conserved.
    e = _edges(spark, [(1, 2), (2, 3)])
    got = {
        r["id"]: r["rank"]
        for r in pagerank(e, undirected=False, n_iter=20).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[3] > got[2] > got[1]


def test_triangle_count_matches_bruteforce(spark):
    import itertools
    import random

    from txf_continuous_data_pipeline_spark.operators.graph import (
        triangle_count,
    )

    rng = random.Random(99)
    n = 25
    pairs = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(120)
            )
            if a != b
        }
    )
    got = triangle_count(_edges(spark, pairs)).collect()[0]["n_triangles"]
    es = set(pairs)
    want = sum(
        1
        for x, y, z in itertools.combinations(range(n), 3)
        if (x, y) in es and (y, z) in es and (x, z) in es
    )
    assert got == want > 0


def test_triangle_count_known_shapes(spark):
    from txf_continuous_data_pipeline_spark.operators.graph import (
        triangle_count,
    )

    # K4 has 4 triangles; adding a pendant edge changes nothing
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert triangle_count(_edges(spark, k4)).collect()[0][0] == 4
    assert (
        triangle_count(_edges(spark, k4 + [(3, 9)])).collect()[0][0] == 4
    )
    # a path has none
    assert (
        triangle_count(
            _edges(spark, [(i, i + 1) for i in range(5)])
        ).collect()[0][0]
        == 0
    )


def test_weighted_pagerank_matches_numpy(spark):
    import random

    import numpy as np

    from txf_continuous_data_pipeline_spark.operators.graph import pagerank

    rng = random.Random(17)
    n = 20
    edges = {}
    for _ in range(60):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges[(a, b)] = edges.get((a, b), 0) + rng.randrange(1, 9)
    df = spark.createDataFrame(
        [(a, b, float(w)) for (a, b), w in edges.items()],
        "id_a long, id_b long, w double",
    )
    got = {
        r["id"]: r["rank"]
        for r in pagerank(
            df, damping=0.85, n_iter=10, weight_col="w"
        ).collect()
    }

    # numpy reference: symmetrized weighted transition matrix
    sym = {}
    for (a, b), w in edges.items():
        sym[(a, b)] = sym.get((a, b), 0) + w
        sym[(b, a)] = sym.get((b, a), 0) + w
    nodes = sorted({x for ab in sym for x in ab})
    idx = {v: i for i, v in enumerate(nodes)}
    m = len(nodes)
    A = np.zeros((m, m))
    for (a, b), w in sym.items():
        A[idx[b], idx[a]] = w
    A /= A.sum(axis=0, keepdims=True)
    r = np.full(m, 1.0 / m)
    for _ in range(10):
        r = 0.15 / m + 0.85 * (A @ r)

    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-12, v


def test_star_hub_graph_fast_and_correct(spark):
    # one hub with 5000 leaves: the star algorithm's hot-key case.
    # Must converge in ~2 rounds with every leaf labeled to the min id.
    pairs = [(9999, i) for i in range(5000)]
    stats = {}
    got = _labels(connected_components(_edges(spark, pairs), stats=stats))
    assert stats["rounds"] <= 3, stats
    assert got[9999] == 0 and len(got) == 5001
    assert all(v == 0 for v in got.values())


def test_unweighted_pagerank_ignores_duplicate_edges(spark):
    from txf_continuous_data_pipeline_spark.operators.graph import pagerank

    base = _edges(spark, [(1, 2), (1, 3)])
    dup = _edges(spark, [(1, 2), (1, 2), (1, 3)])
    r1 = {r["id"]: r["rank"] for r in pagerank(base, n_iter=6).collect()}
    r2 = {r["id"]: r["rank"] for r in pagerank(dup, n_iter=6).collect()}
    for k in r1:
        assert abs(r1[k] - r2[k]) < 1e-12, k


def test_incremental_components_fold_equals_batch(spark, sf_dir):
    """incremental_components: folding edge batches into a stored
    label table must equal batch connected_components over the union
    edge set EXACTLY - including cross-batch merges of previously
    separate components and a later-arriving node whose id undercuts
    (and therefore relabels) an entire stored component."""
    from txf_continuous_data_pipeline_spark.operators.graph import (
        connected_components,
        incremental_components,
    )

    # hand-built edge batches engineering every interesting case:
    #   batch 0: {10,11,12} one component (label 10); {20,21} (label 20)
    #   batch 1: bridge 11-20 merges them (label 10); new {30,31}
    #   batch 2: node 5 attaches to 21 -> the whole merged component
    #            relabels to 5; new singleton pair {40,41}; an edge
    #            INSIDE an existing component (10-12, must be a no-op)
    batches = [
        [(10, 11), (11, 12), (20, 21)],
        [(11, 20), (30, 31)],
        [(5, 21), (40, 41), (10, 12)],
    ]
    labels = spark.createDataFrame([], "id long, component long")
    for rows in batches:
        edges = spark.createDataFrame(rows, "id_a long, id_b long")
        labels = incremental_components(labels, edges).localCheckpoint(
            eager=True
        )
    got = {(r["id"], r["component"]) for r in labels.collect()}

    union = spark.createDataFrame(
        [e for rows in batches for e in rows], "id_a long, id_b long"
    )
    want = {
        (r["id"], r["component"])
        for r in connected_components(union, "id_a", "id_b").collect()
    }
    assert got == want
    # the undercut actually happened: everything reachable from 5
    # carries label 5
    comp5 = {i for i, c in got if c == 5}
    assert comp5 == {5, 10, 11, 12, 20, 21}


def test_incremental_components_fold_on_corpus_pairs(spark, sf_dir):
    """Same fold==batch identity on REAL near-dup pairs: the corpus
    pair frame split into 3 doc-id ranges (cross-range pairs exercise
    the contracted-merge path) folds to exactly the batch CC result."""
    from txf_continuous_data_pipeline_spark.operators.graph import (
        connected_components,
        incremental_components,
    )
    from txf_continuous_data_pipeline_spark.queries.text import (
        _shared_pairs,
    )

    from pyspark.sql import functions as F

    pairs = _shared_pairs(spark, sf_dir).select("id_a", "id_b")
    hi = pairs.agg(
        F.greatest(F.max("id_a"), F.max("id_b")).alias("m")
    ).first()["m"]
    cut1, cut2 = hi // 3, 2 * hi // 3
    batches = [
        pairs.where(F.col("id_b") <= cut1),
        pairs.where((F.col("id_b") > cut1) & (F.col("id_b") <= cut2)),
        pairs.where(F.col("id_b") > cut2),
    ]
    labels = spark.createDataFrame([], "id long, component long")
    for b in batches:
        labels = incremental_components(labels, b).localCheckpoint(
            eager=True
        )
    got = {(r["id"], r["component"]) for r in labels.collect()}
    want = {
        (r["id"], r["component"])
        for r in connected_components(pairs, "id_a", "id_b").collect()
    }
    assert got == want


def test_star_round_without_large_phase_dedup_is_identical(spark):
    """r14 optimization pin: a large+small star round with the large
    phase's trailing distinct SKIPPED (the in-loop shape - the small
    phase's window min is duplicate-insensitive and its own distinct
    restores canonical form) must produce the exact edge set of the
    fully-deduped round, and the undeduped large output must stay
    within the |sym| = 2|e| volume bound on adversarial graphs."""
    import random

    from txf_continuous_data_pipeline_spark.operators.graph import (
        _canon_edges,
        _star_phase,
    )

    rng = random.Random(7)
    cases = [
        # chain with descending ids (the adversarial layout)
        [(i + 1, i) for i in range(30)],
        # two dense blobs + bridge + self-dup edges
        [(rng.randrange(12), rng.randrange(12)) for _ in range(60)]
        + [(100 + rng.randrange(8), 100 + rng.randrange(8)) for _ in range(40)]
        + [(5, 104), (3, 3)],
        # star + isolated pairs
        [(0, i) for i in range(1, 15)] + [(50, 51), (60, 61), (60, 62)],
    ]
    for edges in cases:
        df = spark.createDataFrame(
            [(a, b) for a, b in edges], "id_a long, id_b long"
        )
        e = _canon_edges(df, "id_a", "id_b").localCheckpoint(eager=True)
        n_e = e.count()
        large_nodedup = _star_phase(e, "large", dedup=False)
        # volume bound: at most one emit per sym row
        assert large_nodedup.count() <= 2 * n_e
        got = {
            (r["a"], r["b"])
            for r in _star_phase(large_nodedup, "small").collect()
        }
        want = {
            (r["a"], r["b"])
            for r in _star_phase(_star_phase(e, "large"), "small").collect()
        }
        assert got == want
