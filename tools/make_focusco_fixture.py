"""Freeze the sf0.01 FocusCO expectation as a parquet fixture.

The driver's correctness gate wants a DuckDB-runnable oracle per
query, but FocusCO's expand/contract iteration is not SQL-shaped.
The engine's value parity is instead proven against the NAIVE literal
transcription of /root/reference/apps/focusCO.cpp:162-343 that lives
in tests/test_focusco.py (exact float agreement on every branch).
This tool re-derives the contract query's inputs (supplier
co-occurrence graph, scale-invariant top-4|V| weight threshold,
64 heavy-degree seeds — gminer_spark/contract.py focusco_q) WITHOUT
Spark (DuckDB only), runs that naive oracle to completion for every
seed, applies the engine's CountAgg dedup (focusCO.cpp:97,132-137),
and writes the resulting (cluster, outlier, phi_micro, size) rows to
tests/oracle/focusco_expected_sf001.parquet.  oracle_sql()["focusco"]
then just reads the fixture, so the driver hash-compares real values.

Regenerate after any change to the contract inputs or the reference
semantics:  python tools/make_focusco_fixture.py
"""

from __future__ import annotations

import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "oracle",
    "focusco_expected_sf001.parquet",
)


def micro_half_up(x: float) -> int:
    """Spark's F.round on double: BigDecimal.valueOf (shortest decimal
    repr of the double, == python repr) then HALF_UP."""
    return int(Decimal(repr(x * 1e6)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def main() -> None:
    from gminer_spark.graph.focusco import FocusCOParams
    from tests.test_focusco import _build_adj, focusco_oracle

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW li AS SELECT l_orderkey, l_suppkey "
        f"FROM '{SF_DIR}/lineitem.parquet'"
    )
    wedges = con.sql(
        """
        SELECT a.l_suppkey::BIGINT AS src, b.l_suppkey::BIGINT AS dst,
               COUNT(*)::DOUBLE AS weight
        FROM li a JOIN li b USING (l_orderkey)
        WHERE a.l_suppkey < b.l_suppkey
        GROUP BY 1, 2
        """
    ).df()
    n_v = len(
        set(wedges["src"].tolist()) | set(wedges["dst"].tolist())
    )
    ranked = wedges.sort_values(
        ["weight", "src", "dst"], ascending=[False, True, True]
    )
    kth = float(ranked.head(4 * n_v)["weight"].min())

    heavy = wedges[wedges["weight"] >= kth]
    hd = (
        pd.concat([heavy["src"], heavy["dst"]])
        .value_counts()
        .rename_axis("id")
        .reset_index(name="hd")
        .sort_values(["hd", "id"], ascending=[False, True])
    )
    seeds = [int(i) for i in hd.head(64)["id"]]

    p = FocusCOParams(
        min_weight=kth,
        min_core_size=8,
        min_result_size=3,
        diff_ratio=0.05,
        iter_round_max=3,
        cand_max_time=5.0,
    )
    adj = _build_adj(list(wedges.itertuples(index=False, name=None)))

    out: dict[tuple, tuple] = {}
    for seed in seeds:
        r = focusco_oracle(adj, seed, p)
        if r is None or not r[0]:
            continue
        cluster, outlier, fphi = r
        key = tuple(cluster)
        val = (sorted(outlier), fphi)
        if key not in out or val < out[key]:
            out[key] = val

    rows = [
        {
            "cluster": ",".join(str(v) for v in k),
            "outlier": ",".join(str(v) for v in sorted(v0)),
            "phi_micro": micro_half_up(phi),
            "size": len(k),
        }
        for k, (v0, phi) in sorted(out.items())
    ]
    df = pd.DataFrame(rows, columns=["cluster", "outlier", "phi_micro", "size"])
    df["phi_micro"] = df["phi_micro"].astype("int64")
    df["size"] = df["size"].astype("int32")
    df.to_parquet(OUT, index=False)
    print(f"wrote {len(df)} rows -> {OUT}")
    print(df.to_string())


if __name__ == "__main__":
    main()
