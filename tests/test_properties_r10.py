"""Property tests (hypothesis) for the r10-hardened operators: the
two-pass exact selection against Python's sorted() ground truth over
arbitrary integer domains (including negatives — the floor-bucketing
fix), and connected components against a pure-Python union-find."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pgvector_db_spark.operators.dedup import connected_components
from pgvector_db_spark.operators.stats import exact_rank_select

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(
        st.integers(min_value=-(1 << 40), max_value=1 << 40),
        min_size=1,
        max_size=60,
    ),
    seed=st.integers(min_value=0, max_value=3),
)
@settings(**_SETTINGS)
def test_exact_rank_select_matches_sorted(spark, vals, seed):
    ranks = [1, (len(vals) + 1) // 2, len(vals)]
    df = spark.createDataFrame([(v,) for v in vals], "cents bigint")
    n, got = exact_rank_select(
        df, "cents", [(lambda n, k=k: k) for k in ranks], bucket_width=1 << 16
    )
    truth = sorted(vals)
    assert n == len(vals)
    assert got == [truth[k - 1] for k in ranks]


def _union_find(edges, nodes):
    parent = {u: u for u in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min reachable id per node = min over the component
    comp_min: dict[int, int] = {}
    for u in nodes:
        r = find(u)
        comp_min[r] = min(comp_min.get(r, u), u)
    return {u: comp_min[find(u)] for u in nodes}


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=24),
            st.integers(min_value=0, max_value=24),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    nodes = sorted({u for e in edges for u in e})
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, max_iter=30).collect()
    }
    assert got == _union_find(edges, nodes)
