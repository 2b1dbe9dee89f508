"""Connected-components operators (operators/graph.py): both algorithms
must produce identical (node, component=min-id) labelings, equal to a
driver-side union-find, across adversarial topologies — including the
long chain where naive propagation needs diameter rounds and the
star algorithm proves its O(log n) bound."""

from __future__ import annotations

import random

import pytest

from kafka_streams_tcp_reconciliation_spark.operators.graph import (
    connected_components_propagate,
    connected_components_star,
)


def union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _chain(n: int, start: int = 0) -> list[tuple[int, int]]:
    return [(start + i, start + i + 1) for i in range(n - 1)]


def _random_graph(n: int, m: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(n), rng.randrange(n)) for _ in range(m)
    ]


TOPOLOGIES = {
    "two_stars_and_pair": [(0, 5), (0, 6), (0, 7), (10, 11), (10, 12), (20, 21)],
    "chain_16": _chain(16),
    # descending chain: min is at the far end — worst case for greedy labels
    "reverse_chain": [(i + 1, i) for i in range(14, 0, -1)],
    "random_30_40": _random_graph(30, 40, seed=7),
    "random_dense": _random_graph(12, 50, seed=11),
    "self_loops_and_dups": [(1, 1), (1, 2), (2, 1), (3, 3), (3, 4), (4, 5)],
}


@pytest.mark.parametrize("name", sorted(TOPOLOGIES))
@pytest.mark.parametrize("algo", [connected_components_propagate, connected_components_star])
def test_components_match_union_find(spark, name, algo):
    pairs = TOPOLOGIES[name]
    want = union_find(pairs)
    # nodes appearing only in self-loops are still nodes of the graph for
    # union-find; the operators drop self-loops first, so restrict the
    # expectation to nodes with at least one real edge
    real = {x for a, b in pairs if a != b for x in (a, b)}
    want = {k: v for k, v in want.items() if k in real}
    edges = spark.createDataFrame(pairs, "src: long, dst: long")
    got = {r.node: r.component for r in algo(edges).collect()}
    assert got == want, name


def test_star_resolves_long_chain_in_few_rounds(spark):
    """A 64-node path has diameter 63; the star algorithm must finish
    within its O(log n) round budget (far below 63)."""
    edges = spark.createDataFrame(_chain(64), "src: long, dst: long")
    got = {r.node: r.component for r in connected_components_star(edges, max_rounds=12).collect()}
    assert got == {i: 0 for i in range(64)}
