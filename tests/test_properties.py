"""Hypothesis property tests (FIXTURES.md §4) — pure-python properties
run broadly; Spark-backed properties run on a few drawn examples
(each Spark job costs seconds, so examples are capped)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.oracle import graph_oracle as oracle


# -- pure python: fast, many examples ---------------------------------------


@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
    )
)
@settings(max_examples=200, deadline=None)
def test_normalize_url_idempotent(s):
    from gminer_spark.web.extract import normalize_url

    once = normalize_url(s)
    if once is not None:
        assert normalize_url(once) == once
        assert "#" not in once


edge_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=120
)


@given(edge_lists)
@settings(max_examples=100, deadline=None)
def test_oracle_pagerank_sums_to_one(pairs):
    r = oracle.pagerank(pairs, tol=1e-12)
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)


@given(edge_lists)
@settings(max_examples=100, deadline=None)
def test_oracle_cc_labels_are_min_ids(pairs):
    comp = oracle.cc(pairs)
    groups: dict[int, list[int]] = {}
    for v, c in comp.items():
        groups.setdefault(c, []).append(v)
    for label, members in groups.items():
        assert label == min(members)


@given(edge_lists)
@settings(max_examples=60, deadline=None)
def test_oracle_triangles_match_trace(pairs):
    n = 31
    a = np.zeros((n, n))
    for s, d in pairs:
        if s != d:
            a[s, d] = a[d, s] = 1
    assert oracle.triangles(pairs) == int(round(np.trace(a @ a @ a) / 6))


# -- Spark-backed: few examples, session reused ------------------------------


@given(edge_lists, st.integers(1, 4))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_spark_lpa_matches_oracle_property(spark, pairs, iters):
    from gminer_spark.graph.lpa import label_propagation
    from tests.conftest import edges_df

    pairs = [(s, d) for s, d in pairs if s != d]
    if not pairs:
        return
    res = label_propagation(edges_df(spark, pairs), num_iter=iters)
    got = {r["id"]: r["label"] for r in res.state.collect()}
    assert got == oracle.lpa_sync(pairs, num_iter=iters)


@given(edge_lists)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_spark_triangles_property(spark, pairs):
    from gminer_spark.graph.triangles import triangle_count
    from tests.conftest import edges_df

    pairs = [(s, d) for s, d in pairs if s != d]
    if not pairs:
        return
    assert triangle_count(edges_df(spark, pairs)) == oracle.triangles(pairs)


def test_contract_registry_keys_unique():
    """q[...] / o[...] assignments in contract.py must be unique —
    a duplicate key silently overrides the earlier query (later
    assignment wins) and the overridden operator loses its coverage."""
    import re
    from pathlib import Path

    import gminer_spark.contract as c

    src = Path(c.__file__).read_text()
    for pat in (r'q\["([a-z0-9_]+)"\] = ', r'o\["([a-z0-9_]+)"\] = '):
        keys = re.findall(pat, src)
        dups = sorted({k for k in keys if keys.count(k) > 1})
        assert not dups, f"duplicate contract registrations: {dups}"
