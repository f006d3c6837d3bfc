"""Connected components vs the union-find oracle on adversarial graph shapes
(FIXTURES.md §3): path, star, bridged cliques, self-loops, duplicate and
reversed edges, isolated vertices."""

import pytest

from cs588_data_science_bug_duplicate_detector_spark.operators.cc import (
    connected_components,
    union_find_oracle,
)

SHAPES = {
    "path": [(i, i + 1) for i in range(1, 12)],
    "star": [(1, i) for i in range(2, 15)],
    "reversed_star": [(i, 1) for i in range(2, 15)],
    "two_cliques_bridged": (
        [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
        + [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
        + [(5, 10)]
    ),
    "self_loops_and_dups": [(1, 1), (2, 3), (3, 2), (2, 3), (4, 4)],
    "two_paths": [(1, 2), (2, 3), (10, 11), (11, 12)],
    "long_path": [(i, i + 1) for i in range(1, 60)],
}


def _labels_from_spark(spark, edges, vertices):
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    return {
        r["id"]: r["cluster_id"]
        for r in connected_components(e, vertices=v).collect()
    }


@pytest.mark.parametrize("shape", sorted(SHAPES))
def test_cc_matches_union_find(spark, shape):
    edges = SHAPES[shape]
    vertices = sorted({x for e in edges for x in e} | {999})  # 999 isolated
    got = _labels_from_spark(spark, edges, vertices)
    oracle = union_find_oracle(edges, vertices)
    assert got == oracle
    assert got[999] == 999  # isolated vertex is its own singleton cluster


def test_cc_min_member_convention(spark):
    got = _labels_from_spark(spark, [(7, 3), (3, 9)], [3, 7, 9])
    assert got == {3: 3, 7: 3, 9: 3}


def test_cc_unconverged_raises_instead_of_silent_partial_labels(spark):
    """Exhausting max_iter before the edge set stabilizes must fail loudly:
    labels from a still-evolving edge set silently split true components
    across cluster ids and downstream canonical selection keeps multiple
    'representatives' per cluster with no signal anything went wrong."""
    chain = [(i, i + 1) for i in range(1, 9)]
    e = spark.createDataFrame(chain, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, max_iter=1)
    # the same graph converges fine with the default budget
    got = _labels_from_spark(spark, chain, list(range(1, 10)))
    assert set(got.values()) == {1}


def test_cc_empty_edges(spark):
    e = spark.createDataFrame([], "src long, dst long")
    v = spark.createDataFrame([(1,), (2,)], "id long")
    got = {r["id"]: r["cluster_id"] for r in connected_components(e, vertices=v).collect()}
    assert got == {1: 1, 2: 2}


# --- property-based: random graphs vs the union-find oracle ----------------

try:
    from hypothesis import given, settings, strategies as st

    _edge = st.tuples(st.integers(0, 40), st.integers(0, 40))

    @given(edges=st.lists(_edge, min_size=0, max_size=120))
    @settings(max_examples=10, deadline=None)
    def test_cc_matches_union_find_random(spark_global, edges):
        """Any random multigraph (self-loops, duplicates, reversed edges
        included by construction) must label identically to union-find."""
        vertices = sorted({x for e in edges for x in e} | {777})
        if not edges:
            edges = [(777, 777)]
        got = _labels_from_spark(spark_global, edges, vertices or [777])
        oracle = union_find_oracle(edges, vertices or [777])
        assert got == oracle

    import pytest as _pytest

    @_pytest.fixture(scope="module")
    def spark_global(spark):
        # hypothesis re-enters the test many times; reuse the session fixture
        return spark

except ImportError:  # pragma: no cover - hypothesis is in the toolchain
    pass
