"""Hot-vertex cache for frontier pulls — the RefCache analog.

GMiner keeps a ref-counted cache of remote vertices on every worker so
repeated task pulls of the same (hub) vertex skip the network
(/root/reference/core/ref_cache.hpp:17-60; tasks even sort by
request-set minhash to maximize cache hits,
/root/reference/core/task_sorter.tpp:16-39).

Spark analog: a pull is a ``requests ⋈ adjacency`` shuffle join, and
its skew cost is hub adjacency rows being shuffled once per requesting
task.  Splitting the adjacency into a small HOT set (highest-degree
vertices, capped by total entry budget) broadcast to every executor
and a COLD remainder turns every hub lookup into a map-side hash-join
probe — hub rows cross the wire once per executor instead of once per
request — while the long tail keeps the ordinary shuffle join.  The
split is pure routing: the union equals the plain join bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# default budget: ~8M adjacency entries ≈ 64 MB of packed longs — well
# under executor broadcast comfort, big enough for the hubs that matter
DEFAULT_ENTRY_BUDGET = 8_000_000


def hot_vertex_ids(
    adj: DataFrame,
    hot_k: int = 1024,
    entry_budget: int = DEFAULT_ENTRY_BUDGET,
    adj_col: str = "adj",
) -> list[int]:
    """ids of the top-``hot_k`` vertices by adjacency length whose
    cumulative entry count fits ``entry_budget`` (the cache-capacity
    knob, ref_cache.hpp init(maxsize)).  Distributed top-k (per
    partition heaps), then a driver-side prefix over <= hot_k rows."""
    if hot_k <= 0:
        return []
    ranked = (
        adj.select("id", F.size(adj_col).alias("deg"))
        .orderBy(F.col("deg").desc(), F.col("id"))
        .limit(int(hot_k))
        .collect()
    )
    keep: list[int] = []
    total = 0
    for r in ranked:
        if keep and total + r["deg"] > entry_budget:
            break
        keep.append(int(r["id"]))
        total += r["deg"]
    return keep


def split_adjacency(
    adj: DataFrame,
    hot_k: int = 1024,
    entry_budget: int = DEFAULT_ENTRY_BUDGET,
    adj_col: str = "adj",
) -> tuple[DataFrame | None, DataFrame, list[int]]:
    """(hot, cold, hot_ids): ``hot`` is the broadcast-sized hub slice
    (None when no hubs qualify), ``cold`` the remainder.  Compute once
    per job; reuse across supersteps — the adjacency is static."""
    hot_ids = hot_vertex_ids(adj, hot_k, entry_budget, adj_col)
    if not hot_ids:
        return None, adj, []
    hot = adj.where(F.col("id").isin(hot_ids))
    cold = adj.where(~F.col("id").isin(hot_ids))
    return hot, cold, hot_ids


def minhash_task_order(
    tasks: DataFrame, set_col: str, num_hashes: int = 4
) -> DataFrame:
    """Range-partition tasks by the minhash signature of their request
    set — GMiner's task_sorter (core/task_sorter.tpp:16-39): tasks that
    pull similar vertex sets become neighbors, so a worker's cache (or
    here, an executor partition's pulled rows / Arrow batch) gets
    maximal reuse.  Signatures are md5-derived (functions.h32), all
    JVM-side; adds ``num_hashes`` signature columns ``mh0..mh{n-1}``
    and returns the table range-partitioned by them."""
    from gminer_spark.functions import h32

    out = tasks
    sig_cols = []
    for i in range(num_hashes):
        col = f"mh{i}"
        out = out.withColumn(
            col,
            F.array_min(
                F.transform(
                    F.col(set_col),
                    lambda x, i=i: h32(F.concat(F.lit(f"mh{i}:"), x)),
                )
            ),
        )
        sig_cols.append(col)
    return out.repartitionByRange(*sig_cols)


def cached_pull(
    requests: DataFrame,
    hot: DataFrame | None,
    cold: DataFrame,
    hot_ids: list[int],
) -> DataFrame:
    """``requests ⋈ adjacency`` with hub rows served from the broadcast
    cache.  ``requests`` must carry an ``id`` column; output = requests
    columns + the adjacency payload, identical to a plain inner join."""
    if hot is None or not hot_ids:
        return requests.join(cold, on="id")
    req_hot = requests.where(F.col("id").isin(hot_ids))
    req_cold = requests.where(~F.col("id").isin(hot_ids))
    return req_cold.join(cold, on="id").unionByName(
        req_hot.join(F.broadcast(hot), on="id")
    )
