"""Unit tests for operators/graph.py — exact-integer PageRank."""

from pyspark.sql import functions as F

from kafka_connect_expand_json_transform_spark.operators.graph import TOTAL_Q, pagerank_int


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, n long")


def test_symmetric_cycle_has_equal_ranks(spark):
    e = _edges(spark, [("a", "b", 5), ("b", "c", 5), ("c", "a", 5)])
    ranks = {r.node: r.pagerank for r in pagerank_int(e, iterations=3).collect()}
    assert len(set(ranks.values())) == 1  # perfect symmetry -> identical ints
    assert abs(ranks["a"] - TOTAL_Q // 3) <= 10


def test_star_hub_dominates(spark):
    # 4 spokes all pointing at the hub; hub sends mass back out evenly
    spokes = ["s1", "s2", "s3", "s4"]
    rows = [(s, "hub", 1) for s in spokes] + [("hub", s, 1) for s in spokes]
    ranks = {r.node: r.pagerank for r in pagerank_int(_edges(spark, rows)).collect()}
    assert all(ranks["hub"] > ranks[s] for s in spokes)
    spoke_vals = {ranks[s] for s in spokes}
    assert len(spoke_vals) == 1  # symmetric spokes tie exactly


def test_mass_approximately_conserved(spark):
    e = _edges(spark, [("a", "b", 3), ("b", "a", 1), ("b", "c", 2), ("c", "a", 7)])
    df = pagerank_int(e, iterations=3)
    total = df.agg(F.sum("pagerank")).first()[0]
    # trunc-div loses <1 unit per edge/node per round: bound 3 * (|E|+2|V|)
    assert 0 <= TOTAL_Q - total <= 3 * (4 + 2 * 3) * 100


def test_weights_shift_rank(spark):
    # b receives 9x the weight c does from a; with a absorbing back-links
    e = _edges(spark, [("a", "b", 9), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)])
    ranks = {r.node: r.pagerank for r in pagerank_int(e).collect()}
    assert ranks["b"] > ranks["c"]


def test_triangle_count_known_graphs(spark):
    from kafka_connect_expand_json_transform_spark.operators.graph import triangle_count

    def tri(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        return triangle_count(df).collect()[0]

    # K4: 4 triangles, 6 edges (input has dups/reversals/self-loop to clean)
    k4 = [(i, j) for i in range(4) for j in range(4) if i != j] + [(0, 0), (1, 2)]
    r = tri(k4)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)
    # path graph: no triangles
    r = tri([(0, 1), (1, 2), (2, 3)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 3, 0)
    # two triangles sharing an edge (bowtie minus center): 0-1-2 and 1-2-3
    r = tri([(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 5, 2)
    # star (hub degree 4): orientation must not explode, and count is 0
    r = tri([(9, i) for i in range(4)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (5, 4, 0)


def test_triangle_count_matches_bruteforce_on_random_graphs(spark):
    """Seeded G(n, p) sweep vs itertools brute force — exercises isolated
    vertices, multi-edges, and orientation ties that fixed examples miss."""
    import random
    from itertools import combinations

    from kafka_connect_expand_json_transform_spark.operators.graph import triangle_count

    for seed in range(5):
        rng = random.Random(seed)
        n = 12
        edges = [
            (i, j) for i, j in combinations(range(n), 2) if rng.random() < 0.35
        ]
        edges += [(j, i) for i, j in edges[::3]]  # reversed duplicates
        adj = {frozenset(e) for e in edges}
        expected = sum(
            1
            for t in combinations(range(n), 3)
            if all(frozenset(p) in adj for p in combinations(t, 2))
        )
        df = spark.createDataFrame(edges, "src long, dst long")
        r = triangle_count(df).collect()[0]
        assert r.n_triangles == expected, (seed, r.n_triangles, expected)


def test_label_propagation_two_cliques(spark):
    """Two 3-cliques joined by one bridge edge: after 3 deterministic
    synchronous rounds the two communities remain distinct (clique A settles
    on label 1; clique B settles on a single label of its own — the bridge
    leaks node 3's id across as B's common label but never merges the two
    groups).  Expected labels hand-traced round by round."""
    from kafka_connect_expand_json_transform_spark.operators.graph import (
        label_propagation,
    )

    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.label for r in label_propagation(df, rounds=3).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_label_propagation_matches_bruteforce(spark):
    """Property check vs a pure-Python synchronous LPA (frequency argmax,
    min-label tie-break) on small random graphs."""
    import random
    from collections import Counter

    from kafka_connect_expand_json_transform_spark.operators.graph import (
        label_propagation,
    )

    for seed in (7, 21):
        rng = random.Random(seed)
        n = 14
        edges = sorted(
            {
                (a, b)
                for _ in range(30)
                for a, b in [sorted(rng.sample(range(n), 2))]
            }
        )
        und = {}
        for a, b in edges:
            und.setdefault(a, set()).add(b)
            und.setdefault(b, set()).add(a)
        labels = {v: v for v in und}
        for _ in range(3):
            new = {}
            for v, nbrs in und.items():
                cnt = Counter(labels[u] for u in nbrs)
                best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
            labels = new
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.label for r in label_propagation(df, rounds=3).collect()}
        assert got == labels, (seed, got, labels)


def test_bfs_hops_matches_bruteforce(spark):
    """bfs_hops vs a pure-Python BFS truncated at 3 hops on small random
    graphs (source = node 0, present in every graph by construction)."""
    import random
    from collections import deque

    from kafka_connect_expand_json_transform_spark.operators.graph import bfs_hops

    for seed in (3, 11):
        rng = random.Random(seed)
        n = 12
        edges = sorted(
            {(0, rng.randrange(1, n))}
            | {
                (a, b)
                for _ in range(20)
                for a, b in [sorted(rng.sample(range(n), 2))]
            }
        )
        und = {}
        for a, b in edges:
            und.setdefault(a, set()).add(b)
            und.setdefault(b, set()).add(a)
        expect = {0: 0}
        q = deque([0])
        while q:
            v = q.popleft()
            if expect[v] >= 3:
                continue
            for u in und[v]:
                if u not in expect:
                    expect[u] = expect[v] + 1
                    q.append(u)
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.dist for r in bfs_hops(df, 0, rounds=3).collect()}
        assert got == expect, (seed, got, expect)


def test_per_vertex_triangles_known_graphs(spark):
    from kafka_connect_expand_json_transform_spark.operators.graph import (
        per_vertex_triangles,
    )

    # K4: every vertex is in C(3,2) = 3 triangles
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    df = spark.createDataFrame(k4, "src long, dst long")
    got = {r.v: r.n_tri for r in per_vertex_triangles(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # bowtie: two triangles sharing vertex 2
    bow = [(0, 1), (0, 2), (1, 2), (2, 3), (2, 4), (3, 4)]
    df = spark.createDataFrame(bow, "src long, dst long")
    got = {r.v: r.n_tri for r in per_vertex_triangles(df).collect()}
    assert got == {0: 1, 1: 1, 2: 2, 3: 1, 4: 1}
    # path: no triangles -> empty result
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    assert per_vertex_triangles(df).count() == 0


def test_per_vertex_triangles_sum_is_3x_global(spark):
    """Σ_v tri(v) == 3 * global triangle count on random graphs."""
    import random
    from itertools import combinations

    from kafka_connect_expand_json_transform_spark.operators.graph import (
        per_vertex_triangles,
        triangle_count,
    )

    for seed in (2, 9):
        rng = random.Random(seed)
        edges = [
            (i, j) for i, j in combinations(range(12), 2) if rng.random() < 0.35
        ]
        df = spark.createDataFrame(edges, "src long, dst long")
        total = triangle_count(df).collect()[0].n_triangles
        per_v = sum(r.n_tri for r in per_vertex_triangles(df).collect())
        assert per_v == 3 * total, (seed, per_v, total)
