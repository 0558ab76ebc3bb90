"""Connected-components equivalence: star_components (large/small-star,
Kiveris et al. SoCC'14) vs min_label_components vs a Python union-find
ground truth, on graph shapes that stress different regimes:

- long chains (diameter >> log n — the regime star exists for),
- cliques + isolated vertices (the near-dup regime),
- seeded random graphs (structure-free),
- string keys (curate's url-keyed clustering).
"""

from __future__ import annotations

import random

import pytest

from extractor_spark.spark.graph import min_label_components, star_components
from extractor_spark.spark.queries import release_query_caches


def union_find_labels(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min element of each component
    comp_min: dict = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def _run(spark, algo, nodes, edges, key="id"):
    nodes_df = spark.createDataFrame([(n,) for n in nodes], [key])
    if edges:
        pairs = spark.createDataFrame(edges, ["src", "dst"])
    else:
        pairs = nodes_df.selectExpr(f"{key} AS src", f"{key} AS dst").limit(0)
    got = {r[0]: r[1] for r in algo(nodes_df, pairs, key).collect()}
    release_query_caches()
    return got


@pytest.mark.parametrize("algo", [star_components, min_label_components])
def test_cliques_and_isolated(spark, algo):
    nodes = list(range(20))
    # two 4-cliques, one pair, the rest isolated
    cliq = lambda ids: [(a, b) for a in ids for b in ids if a < b]
    edges = cliq([3, 5, 7, 9]) + cliq([2, 4, 6, 8]) + [(18, 19)]
    expect = union_find_labels(nodes, edges)
    assert _run(spark, algo, nodes, edges) == expect


def test_star_long_chain(spark):
    """A 120-hop chain: label propagation needs 120 rounds here; star must
    produce the identical labeling in O(log) rounds (wall-clock-bounded by
    the test timeout rather than asserted — correctness is the assertion)."""
    nodes = list(range(121))
    edges = [(i, i + 1) for i in range(120)]
    expect = union_find_labels(nodes, edges)
    assert _run(spark, star_components, nodes, edges) == expect


@pytest.mark.parametrize("seed", [1, 7])
def test_star_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    n = 300
    nodes = list(range(n))
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(n // 2)
    ]  # sparse → many components of varied shape, some self-loops
    expect = union_find_labels(nodes, edges)
    assert _run(spark, star_components, nodes, edges) == expect


def test_star_string_keys(spark):
    """curate clusters by url (string keys) — min() is lexicographic."""
    nodes = ["a://1", "b://2", "c://3", "d://4", "e://5"]
    edges = [("b://2", "d://4"), ("d://4", "a://1")]
    expect = union_find_labels(nodes, edges)
    assert _run(spark, star_components, nodes, edges, key="url") == expect


def test_star_agrees_with_min_label(spark):
    rng = random.Random(42)
    n = 200
    nodes = list(range(n))
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(n)]
    a = _run(spark, star_components, nodes, edges)
    b = _run(spark, min_label_components, nodes, edges)
    assert a == b
