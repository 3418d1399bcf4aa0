"""Emulate the driver harness: run every queries() entry on Spark and its
oracle_sql() on DuckDB at sf0.01; compare row count, schema-ish, and
order-insensitive values.  Exact equality required (the driver hashes).

Usage: python tools/check_contract.py [only_query_name ...]
"""

from __future__ import annotations

import importlib.util
import math
import sys
import time

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return repr(v)


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def main() -> int:
    only = set(sys.argv[1:])
    spec = importlib.util.spec_from_file_location(
        "entrymod", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    sys.path.insert(0, "/root/repo")
    from gminer_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = m.queries()
    os_ = m.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            fails.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        t_spark = time.time() - t0
        sql = os_.get(name)
        if sql is None:
            print(f"rows-only {name}: {len(sdf)} rows  cols={sorted(sdf.columns)} "
                  f"[{t_spark:.1f}s]")
            if len(sdf) == 0 and name not in ("dedup_exact",):
                print(f"  WARN {name}: 0 rows")
            continue
        t0 = time.time()
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            fails.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        t_duck = time.time() - t0
        status = []
        if len(sdf) != len(odf):
            status.append(f"ROWCOUNT spark={len(sdf)} duck={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            status.append(f"COLS spark={sorted(sdf.columns)} duck={sorted(odf.columns)}")
        if not status:
            cs, co = canon(sdf), canon(odf)
            if cs != co:
                ndiff = sum(1 for a, b in zip(cs, co) if a != b)
                status.append(f"VALUES {ndiff}/{len(cs)} rows differ")
                for a, b in list(zip(cs, co))[:200]:
                    if a != b:
                        status.append(f"  spark={a}")
                        status.append(f"  duck ={b}")
                        break
        if status:
            fails.append(name)
            print(f"FAIL {name} [{t_spark:.1f}s/{t_duck:.1f}s]: " + "; ".join(status))
        else:
            print(f"OK   {name}: {len(sdf)} rows [{t_spark:.1f}s spark, {t_duck:.1f}s duck]")

    spark.stop()
    print(f"\n{len(fails)} failures: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
