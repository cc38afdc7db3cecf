"""Property test for the large-star/small-star connected-components
rewrite of ``dup_clusters`` (Kiveris et al. 2014): on arbitrary graphs
the star fixpoint must label every paired node with its component's
MINIMUM id — exactly what the previous min-label-propagation
implementation (and the recursive-CTE DuckDB oracle) produce. The
reference expectation is an in-test union-find, so the pin is against
the mathematical definition, not a second Spark implementation."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from zestdb_spark.functions import dedup

# node ids drawn from a small range so components collide/merge often;
# id_a != id_b mirrors the upstream contract (every pair producer in
# dedup emits id_a < id_b, never self-pairs) — reversed duplicates and
# repeated edges ARE generated and must be harmless
_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=24),
        st.integers(min_value=0, max_value=24),
    ).filter(lambda p: p[0] != p[1]),
    min_size=0,
    max_size=30,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _union_find_min_labels(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@given(pairs=_edges)
@_SETTINGS
def test_star_cc_equals_union_find(spark, pairs):
    schema = "id_a long, id_b long"
    df = (
        spark.createDataFrame(pairs, schema)
        if pairs
        else spark.createDataFrame([], schema)
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in dedup.dup_clusters(df).collect()
    }
    assert got == _union_find_min_labels(pairs)


def test_star_cc_long_chain_converges_fast(spark):
    # a 64-node path is the adversarial case for plain min-label
    # propagation (diameter 63 → 63 rounds); the star algorithm must
    # finish well inside the default max_iters guard
    pairs = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in dedup.dup_clusters(df, max_iters=10).collect()}
    assert got == {i: 0 for i in range(64)}
