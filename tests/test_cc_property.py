"""Property test: the two connected-components implementations
(operators/dedup.py min-label propagation and large-star/small-star)
agree with each other AND with a pure-Python union-find ground truth on
random graphs — including long chains (diameter stress for min-label)
and whale clusters (hub-degree stress for star) (VERDICT r7 #10: cheap
insurance on the operator the whole dedup family leans on)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from predictor_spark.operators.dedup import (connected_components,
                                             connected_components_star)


def _union_find(n_vertices: set[int], edges: list[tuple[int, int]]):
    parent = {v: v for v in n_vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min vertex id in the component (both operators'
    # output contract)
    comp_min: dict[int, int] = {}
    for v in n_vertices:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in n_vertices}


@st.composite
def graphs(draw):
    """Random edges + optionally a long chain and/or a whale hub, glued
    onto the same vertex id space so shapes can merge."""
    edges = draw(st.lists(
        st.tuples(st.integers(0, 39), st.integers(0, 39)),
        min_size=0, max_size=40))
    if draw(st.booleans()):  # long chain: diameter >> log(n)
        base = draw(st.integers(0, 60))
        length = draw(st.integers(5, 25))
        edges += [(base + i, base + i + 1) for i in range(length)]
    if draw(st.booleans()):  # whale: one hub touching many spokes
        hub = draw(st.integers(0, 80))
        spokes = draw(st.integers(8, 20))
        edges += [(hub, hub + 1 + s) for s in range(spokes)]
    return [(a, b) for a, b in edges if a != b]


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(graphs())
def test_min_label_and_star_match_union_find(spark, edge_list):
    if not edge_list:
        return
    verts = {v for e in edge_list for v in e}
    want = _union_find(verts, edge_list)

    edges = spark.createDataFrame(edge_list, "id_a bigint, id_b bigint")
    # max_iter = |V| upper-bounds any diameter the strategy can build
    ml = {r["vertex"]: r["component"]
          for r in connected_components(edges, max_iter=len(verts)).collect()}
    star = {r["vertex"]: r["component"]
            for r in connected_components_star(edges).collect()}
    assert ml == want
    assert star == want
