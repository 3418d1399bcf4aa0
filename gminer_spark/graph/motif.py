"""Declarative motif finding — API sugar over join-chain pattern match.

The reference's GM app matches a hard-coded labeled pattern by chained
candidate pulls (/root/reference/apps/*graphmatch*.cpp analog in
SURVEY.md §2.10 "GM"); the engine's `pattern_match` contract query
re-expresses that one pattern as joins.  This module generalizes it:
a GraphFrames-style pattern string compiles to a Catalyst join chain,
so ANY small motif is a one-liner and the optimizer keeps owning join
order and physical strategy.

Grammar (terms separated by ';'):

    (a)-(b)        undirected edge between bindings a and b
    (a)->(b)       directed edge a -> b
    (a)-[e]-(b)    same, binding the edge: every extra column c of the
    (a)-[e]->(b)   edge table appears in the output as ``e_c``
    !(a)-(b)       NO edge between a and b (anti-join; both bound)
    !(b)->(c)      anti-VERTEX: with c otherwise unbound, matches only
                   when b has NO out-edge at all (e.g. dangling pages);
                   symmetrically !(c)->(b) / !(b)-(c) for in/any-edge

Semantics follow GraphFrames: one output column per vertex variable
(plus ``e_*`` for bound edges); distinct variables MAY bind the same
vertex — add `a != c` / `a < c` filters for isomorphic matches.
Undirected terms match over the symmetrized edge view (edge attributes
carried to both directions); negated terms compile to left-anti joins
at the end, so Catalyst still owns the positive join order.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.graph import tables

_TERM = re.compile(r"^(!?)\((\w+)\)-(?:\[(\w+)\]-)?(>?)\((\w+)\)$")


def _parse(pattern: str) -> list[tuple[bool, str, str | None, bool, str]]:
    terms = []
    for raw in pattern.split(";"):
        raw = raw.strip().replace(" ", "")
        if not raw:
            continue
        m = _TERM.match(raw)
        if not m:
            raise ValueError(f"bad motif term: {raw!r}")
        neg, a, evar, arrow, b = m.groups()
        if a == b:
            raise ValueError(f"self-loop term not supported: {raw!r}")
        if neg and evar:
            raise ValueError(f"edge variable on a negated term: {raw!r}")
        terms.append((neg == "!", a, evar, arrow == ">", b))
    if not terms:
        raise ValueError("empty motif pattern")
    evars = [t[2] for t in terms if t[2]]
    if len(evars) != len(set(evars)):
        raise ValueError("edge variables must be distinct")
    return terms


def _symmetrize_with_attrs(edges: DataFrame) -> DataFrame:
    """Undirected view carrying every non-key column to both directions."""
    extra = [c for c in edges.columns if c not in ("src", "dst")]
    fwd = edges.select("src", "dst", *extra)
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), *extra
    )
    return fwd.unionByName(rev).where(F.col("src") != F.col("dst")).distinct()


def find(edges: DataFrame, pattern: str) -> DataFrame:
    """Match ``pattern`` against the (src, dst, attrs...) edge table;
    returns one row per binding with one long column per vertex
    variable and ``<evar>_<col>`` columns for each bound edge."""
    terms = _parse(pattern)
    extra = [c for c in edges.columns if c not in ("src", "dst")]
    directed = edges.select("src", "dst", *extra).distinct()
    sym = _symmetrize_with_attrs(edges)

    def edge_view(
        is_directed: bool, a: str, b: str, evar: str | None
    ) -> DataFrame:
        base = directed if is_directed else sym
        cols = [F.col("src").alias(a), F.col("dst").alias(b)]
        if evar:
            cols += [F.col(c).alias(f"{evar}_{c}") for c in extra]
            return base.select(*cols)
        # no edge variable: the term is purely topological, so dedupe
        # the projected (a, b) view — edge tables with duplicate
        # (src, dst) rows differing only in attribute columns must not
        # multiply match counts
        return base.select(*cols).distinct()

    bindings: DataFrame | None = None
    bound: set[str] = set()
    negatives: list[tuple[str, bool, str]] = []
    for neg, a, evar, is_dir, b in terms:
        if neg:
            negatives.append((a, is_dir, b))
            continue
        ev = edge_view(is_dir, a, b, evar)
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
    if bindings is None:
        raise ValueError("pattern needs at least one positive term")
    for a, is_dir, b in negatives:
        missing = [v for v in (a, b) if v not in bound]
        if len(missing) == 2:
            raise ValueError(
                f"negated term !({a})-({b}) references no bound variable"
            )
        ev = edge_view(is_dir, a, b, None)
        if not missing:
            bindings = bindings.join(ev, on=[a, b], how="left_anti")
        else:
            # anti-vertex: the unbound end is existentially quantified —
            # keep bindings whose bound end has NO such edge at all.
            anchor = a if b in missing else b
            bindings = bindings.join(
                ev.select(anchor).distinct(), on=anchor, how="left_anti"
            )
    return bindings
