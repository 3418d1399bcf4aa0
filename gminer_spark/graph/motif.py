"""Declarative motif finding — API sugar over join-chain pattern match.

The reference's GM app matches a hard-coded labeled pattern by chained
candidate pulls (/root/reference/apps/*graphmatch*.cpp analog in
SURVEY.md §2.10 "GM"); the engine's `pattern_match` contract query
re-expresses that one pattern as joins.  This module generalizes it:
a GraphFrames-style pattern string compiles to a Catalyst join chain,
so ANY small motif is a one-liner and the optimizer keeps owning join
order and physical strategy.

Grammar (terms separated by ';'):

    (a)-(b)      undirected edge between bindings a and b
    (a)->(b)     directed edge a -> b
    !(a)-(b)     NO edge between a and b (anti-join; both vars must
                 already be bound by positive terms)

Semantics follow GraphFrames: one output column per variable; distinct
variables MAY bind the same vertex — add `a != c` / `a < c` filters
for isomorphic matches.  Undirected terms match over the symmetrized
edge view; each positive term joins (or semi-joins, when both ends
are bound) the running binding table; negated terms are left-anti
joins at the end.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.graph import tables

_TERM = re.compile(r"^(!?)\((\w+)\)(-|->)\((\w+)\)$")


def _parse(pattern: str) -> list[tuple[bool, str, bool, str]]:
    terms = []
    for raw in pattern.split(";"):
        raw = raw.strip().replace(" ", "")
        if not raw:
            continue
        m = _TERM.match(raw)
        if not m:
            raise ValueError(f"bad motif term: {raw!r}")
        neg, a, arrow, b = m.groups()
        if a == b:
            raise ValueError(f"self-loop term not supported: {raw!r}")
        terms.append((neg == "!", a, arrow == "->", b))
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def find(edges: DataFrame, pattern: str) -> DataFrame:
    """Match ``pattern`` against the (src, dst) edge table; returns one
    row per binding with one long column per variable."""
    terms = _parse(pattern)
    directed = edges.select("src", "dst").distinct()
    sym = tables.symmetrize(edges)

    def edge_view(is_directed: bool, a: str, b: str) -> DataFrame:
        base = directed if is_directed else sym
        return base.select(F.col("src").alias(a), F.col("dst").alias(b))

    bindings: DataFrame | None = None
    bound: set[str] = set()
    negatives: list[tuple[str, bool, str]] = []
    for neg, a, is_dir, b in terms:
        if neg:
            negatives.append((a, is_dir, b))
            continue
        ev = edge_view(is_dir, a, b)
        if bindings is None:
            bindings = ev
            bound |= {a, b}
            continue
        known = [v for v in (a, b) if v in bound]
        if not known:
            raise ValueError(
                f"disconnected positive term ({a})-({b}): motifs must "
                "chain through already-bound variables"
            )
        bindings = bindings.join(ev, on=known)
        bound |= {a, b}
    for a, is_dir, b in negatives:
        missing = {a, b} - bound
        if missing:
            raise ValueError(
                f"negated term references unbound variable(s) {missing}"
            )
        bindings = bindings.join(edge_view(is_dir, a, b), on=[a, b], how="left_anti")
    return bindings
