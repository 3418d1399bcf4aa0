"""ANF / HyperBall: the approximate neighborhood function N(r) —
how many (vertex, vertex) pairs are within distance r — via one
HyperLogLog sketch per vertex, advanced one BFS radius per round.

This is THE scale path for distance statistics on a web graph: the
exact distance distribution needs all-pairs BFS (impossible at 10^12
docs) and the sampled histogram (`betweenness.distance_histogram`)
trades coverage for cost.  ANF (Palmer/Gibbons/Faloutsos KDD'02) and
its HyperLogLog refinement HyperBall (Boldi/Vigna, used for the
Facebook four-degrees measurement) keep a tiny register sketch of the
ball B(v, r) at EVERY vertex and grow all balls simultaneously:
``sketch_{r+1}(v) = sketch_r(v) ∪ ⋃_{(v,u)∈E} sketch_r(u)`` — and an
HLL union is just an elementwise register max.

Spark-first layout: registers live as ROWS ``(id, j, rho)`` (register
index j, max leading-zero count rho), not arrays — so the union-max
per radius is ONE equi-join edges⋈state plus ONE map-side-combinable
``groupBy(id, j).max(rho)``, all whole-stage codegen, no UDFs.  State
is multi-referenced per round, hence the lazy ``plan_barrier``
(Spark-4 origin-chain discipline).  Rows per vertex are capped at m
(=16) registers, so state is O(m·|V|) regardless of graph size.

Cross-engine exactness discipline (the repo's micro-int contract):
registers are integers (md5-derived j, rho via bin/lpad/instr — both
engines agree bit-for-bit); the HLL denominator is the EXACT integer
``Z32 = Σ_j 2^(32 - rho_j)`` (absent registers contribute 2^32); the
only floating step is the per-vertex estimate, computed from shared
decimal literals (no libm log — the small-range correction's
``m·ln(m/zeros)`` values are embedded as 16 pre-printed constants),
rounded per vertex to micro-ints BEFORE the global sum so the final
reduction is an exact, partition-order-independent BIGINT sum.

Reference analog: GMiner's per-superstep global aggregator over
per-vertex state (`system/aggregator.hpp`); the sketch rows play the
role of the per-vertex adjacency summaries its tasks exchange.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.functions import h32
from gminer_spark.graph import tables

M = 16  # registers per vertex; HLL alpha constant below is m=16-specific
ALPHA_MM = 172.288  # alpha_16 (=0.673) * m^2 — ONE shared literal
POW32 = 4294967296  # 2^32

# m * ln(m / z) for z = 1..16, printed to full double precision so both
# engines parse the same decimal literal instead of calling libm ln().
_LN_TABLE = [float(repr(16.0 * math.log(16.0 / z))) for z in range(1, M + 1)]


def _rho(col):
    """Leading-zero-count rank of a 32-bit hash: position of the first
    1-bit in the 32-char binary rendering, capped at 32 (hash 0 maps
    to 32 too, so 2^(32-rho) stays an exact integer ≥ 1 — a cast of
    fractional 0.5 would round differently across engines)."""
    return F.when(col == 0, F.lit(32)).otherwise(
        F.instr(F.lpad(F.bin(col), 32, "0"), "1")
    )


def _rho_sql(expr: str) -> str:
    return (
        f"CASE WHEN {expr} = 0 THEN 32 "
        f"ELSE instr(lpad(bin(CAST({expr} AS BIGINT)), 32, '0'), '1') END"
    )


def _estimate_cols():
    """(zeros, z32) -> est_micro: the HLL estimate with small-range
    correction, micro-rounded per vertex.  `zeros` = m - #present
    registers, `z32` = Σ 2^(32-rho) over present + zeros * 2^32."""
    raw = F.lit(ALPHA_MM) * F.lit(float(POW32)) / F.col("z32").cast("double")
    # small-range: est <= 2.5m and zeros > 0 -> m * ln(m / zeros)
    # (index clamped to >= 1: Spark ANSI element_at rejects index 0
    # even though the zeros = 0 row always takes the other branch)
    ln_lookup = F.element_at(
        F.array(*[F.lit(v) for v in _LN_TABLE]),
        F.greatest(F.col("zeros").cast("int"), F.lit(1)),
    )
    est = F.when(
        (raw <= F.lit(2.5 * M)) & (F.col("zeros") > 0), ln_lookup
    ).otherwise(raw)
    return F.round(est * 1e6, 0).cast("long").alias("est_micro")


def _init_state(adj: DataFrame) -> DataFrame:
    """Singleton HLL sketches: one register row per vertex."""
    verts = (
        adj.select(F.col("src").alias("id"))
        .unionByName(adj.select(F.col("dst").alias("id")))
        .distinct()
    )
    return verts.select(
        "id",
        (h32(F.concat(F.lit("anfj:"), F.col("id").cast("string"))) % M)
        .cast("int")
        .alias("j"),
        _rho(h32(F.concat(F.lit("anfr:"), F.col("id").cast("string"))))
        .cast("int")
        .alias("rho"),
    )


def _advance(adj: DataFrame, state: DataFrame) -> DataFrame:
    """One HyperBall radius: push sketches over edges, register max."""
    pushed = adj.join(state.withColumnRenamed("id", "dst"), on="dst").select(
        F.col("src").alias("id"), "j", "rho"
    )
    return tables.plan_barrier(
        state.unionByName(pushed)
        .groupBy("id", "j")
        .agg(F.max("rho").alias("rho")),
        eager=False,
    )


def _per_vertex_est(state: DataFrame) -> DataFrame:
    """(id, est_micro): the per-vertex HLL ball-size estimate."""
    return state.groupBy("id").agg(
        (F.lit(M) - F.count("*")).cast("long").alias("zeros"),
        (
            F.sum(F.pow(F.lit(2.0), 32 - F.col("rho")).cast("long"))
            + (F.lit(M) - F.count("*")) * F.lit(POW32)
        )
        .cast("long")
        .alias("z32"),
    ).select("id", _estimate_cols())


def ball_sizes(
    edges: DataFrame, radius: int = 2, directed: bool = False
) -> DataFrame:
    """``(id, ball_size_micro)`` — the estimated number of vertices
    within distance ``radius`` of each vertex (itself included), the
    HyperBall per-vertex readout.  A standard structural feature for
    graph ML (local density / hub reach) that no exact method can
    compute at web scale; same register plan as
    :func:`neighborhood_function`, one join + one max-agg per radius,
    a single per-vertex estimate at the end."""
    spark = edges.sparkSession
    adj = edges.select("src", "dst") if directed else tables.symmetrize(edges)
    adj = adj.repartition(tables.shuffle_partitions(spark), "dst").persist()
    state = tables.plan_barrier(_init_state(adj), eager=False)
    for _ in range(radius):
        state = _advance(adj, state)
    out = _per_vertex_est(state).select(
        "id", F.col("est_micro").alias("ball_size_micro")
    )
    out = out.localCheckpoint()  # materialize before releasing adj
    adj.unpersist()
    return out


def ball_sizes_oracle_sql(
    edges_cte: str, radius: int, directed: bool = False
) -> str:
    """DuckDB witness: the register recursion unrolled, per-vertex
    estimate at the final radius."""
    nf = neighborhood_function_oracle_sql(edges_cte, radius, directed)
    # reuse the register CTE chain; replace the final readout
    ctes = nf[: nf.index(",\nest0 AS ")]
    raw = (
        f"CAST({ALPHA_MM!r} AS DOUBLE) * CAST({POW32} AS DOUBLE)"
        " / CAST(z32 AS DOUBLE)"
    )
    ln_vals = ", ".join(f"CAST({v!r} AS DOUBLE)" for v in _LN_TABLE)
    return (
        ctes
        + f"""
SELECT id, CAST(ROUND(CASE
        WHEN {raw} <= CAST(40 AS DOUBLE) AND zeros > 0
        THEN ([{ln_vals}])[CAST(GREATEST(zeros, 1) AS INTEGER)]
        ELSE {raw} END * 1e6) AS BIGINT) AS ball_size_micro
FROM (
    SELECT id, CAST({M} - COUNT(*) AS BIGINT) AS zeros,
           CAST(SUM(CAST(POW(2.0, 32 - rho) AS BIGINT))
                + ({M} - COUNT(*)) * CAST({POW32} AS BIGINT)
                AS BIGINT) AS z32
    FROM reg{radius} GROUP BY id)
"""
    )


def neighborhood_function(
    edges: DataFrame, radius: int = 4, directed: bool = False
) -> DataFrame:
    """``(r, n_pairs_est_micro)`` for r = 0..radius: the estimated
    number of (u, v) pairs with d(u, v) <= r (v = u included),
    micro-scaled BIGINT (sum of per-vertex micro-rounded HLL
    estimates).  ``directed=False`` symmetrizes first (ball = hop
    neighborhood either direction); ``directed=True`` grows OUT-balls.
    """
    spark = edges.sparkSession
    adj = edges.select("src", "dst") if directed else tables.symmetrize(edges)
    adj = adj.repartition(tables.shuffle_partitions(spark), "dst").persist()
    state = tables.plan_barrier(_init_state(adj), eager=False)

    def n_est(st: DataFrame) -> int:
        row = (
            _per_vertex_est(st).agg(F.sum("est_micro").alias("s")).first()
        )
        return int(row["s"] or 0)

    out = [(0, n_est(state))]
    for r in range(1, radius + 1):
        state = _advance(adj, state)
        out.append((r, n_est(state)))
    adj.unpersist()
    return spark.createDataFrame(
        out, "r long, n_pairs_est_micro long"
    )


def neighborhood_function_oracle_sql(
    edges_cte: str, radius: int, directed: bool = False
) -> str:
    """DuckDB witness: the identical register recursion unrolled —
    reg0 = per-vertex init, reg_{r} = group-max of reg_{r-1} plus the
    edge-pushed copy, est_r = micro-rounded per-vertex HLL estimates
    summed exactly."""
    from gminer_spark.functions import h32_sql

    adj = (
        "adj AS (SELECT src, dst FROM edges)"
        if directed
        else "adj AS (SELECT src, dst FROM edges UNION "
        "SELECT dst AS src, src AS dst FROM edges)"
    )
    jh = h32_sql("'anfj:' || CAST(id AS VARCHAR)")
    rh = h32_sql("'anfr:' || CAST(id AS VARCHAR)")
    # every literal CAST AS DOUBLE: DuckDB bare decimals are DECIMAL
    # arithmetic, not IEEE (documented repo pitfall)
    ln_vals = ", ".join(f"CAST({v!r} AS DOUBLE)" for v in _LN_TABLE)
    raw = (
        f"CAST({ALPHA_MM!r} AS DOUBLE) * CAST({POW32} AS DOUBLE)"
        " / CAST(z32 AS DOUBLE)"
    )
    ctes = [
        edges_cte.strip(),
        adj,
        """verts AS (
    SELECT DISTINCT src AS id FROM adj
    UNION SELECT DISTINCT dst AS id FROM adj)""",
        f"""reg0 AS MATERIALIZED (
    SELECT id, CAST({jh} % {M} AS INTEGER) AS j,
           CAST({_rho_sql(rh)} AS INTEGER) AS rho
    FROM verts)""",
    ]
    for r in range(1, radius + 1):
        p = f"reg{r - 1}"
        ctes.append(
            f"""reg{r} AS MATERIALIZED (
    SELECT id, j, MAX(rho) AS rho FROM (
        SELECT id, j, rho FROM {p}
        UNION ALL
        SELECT a.src AS id, s.j, s.rho
        FROM adj a JOIN {p} s ON s.id = a.dst)
    GROUP BY id, j)"""
        )
    # per-radius estimate CTEs
    for r in range(radius + 1):
        ctes.append(
            f"""est{r} AS (
    SELECT CAST(SUM(est_micro) AS BIGINT) AS s FROM (
        SELECT CAST(ROUND(CASE
            WHEN {raw} <= CAST(40 AS DOUBLE) AND zeros > 0
            THEN ([{ln_vals}])[CAST(GREATEST(zeros, 1) AS INTEGER)]
            ELSE {raw} END * 1e6) AS BIGINT)
            AS est_micro
        FROM (
            SELECT id, CAST({M} - COUNT(*) AS BIGINT) AS zeros,
                   CAST(SUM(CAST(POW(2.0, 32 - rho) AS BIGINT))
                        + ({M} - COUNT(*)) * CAST({POW32} AS BIGINT)
                        AS BIGINT) AS z32
            FROM reg{r} GROUP BY id)))"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS r, s AS n_pairs_est_micro FROM est{r}"
        for r in range(radius + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


def effective_diameter_micro(nf: DataFrame, q: float = 0.9) -> DataFrame:
    """1-row ``(effective_diameter_micro,)`` from a neighborhood
    function table: the smallest r with N(r) >= q * N(r_max), linearly
    interpolated between r-1 and r (the standard ANF readout)."""
    rows = sorted(
        (r["r"], r["n_pairs_est_micro"]) for r in nf.collect()
    )
    target = q * rows[-1][1]
    if rows[0][1] >= target:
        eff = float(rows[0][0])
    else:
        eff = float(rows[-1][0])
        for (r0, n0), (r1, n1) in zip(rows, rows[1:]):
            if n1 >= target:
                # n0 < target <= n1 here, so the divisor is positive
                eff = r0 + (target - n0) / (n1 - n0) * (r1 - r0)
                break
    spark = nf.sparkSession
    return spark.createDataFrame(
        [(int(math.floor(eff * 1e6 + 0.5)),)],
        "effective_diameter_micro long",
    )


def effective_diameter_oracle_sql(
    edges_cte: str, radius: int, q: float = 0.9, directed: bool = False
) -> str:
    """DuckDB witness for :func:`effective_diameter_micro` over the
    unrolled neighborhood-function witness: same target (q × N(max)),
    same linear interpolation, same floor(x·1e6 + 0.5) quantization —
    every float op mirrored in the python readout's order."""
    nf = neighborhood_function_oracle_sql(edges_cte, radius, directed)
    return f"""
SELECT CAST(FLOOR(eff * 1e6 + 0.5) AS BIGINT) AS effective_diameter_micro
FROM (
    WITH nf AS ({nf}),
    t AS (SELECT CAST({q!r} AS DOUBLE)
                 * (SELECT n_pairs_est_micro FROM nf
                    ORDER BY r DESC LIMIT 1) AS target),
    hit AS (SELECT (SELECT MIN(r) FROM nf, t
                    WHERE n_pairs_est_micro >= t.target) AS r1)
    SELECT CASE
        WHEN (SELECT n_pairs_est_micro FROM nf ORDER BY r LIMIT 1)
             >= t.target
        THEN CAST((SELECT MIN(r) FROM nf) AS DOUBLE)
        ELSE CAST(hit.r1 - 1 AS DOUBLE)
             + ((t.target
                 - CAST((SELECT n_pairs_est_micro FROM nf
                         WHERE r = hit.r1 - 1) AS DOUBLE))
                / CAST((SELECT n_pairs_est_micro FROM nf
                        WHERE r = hit.r1)
                       - (SELECT n_pairs_est_micro FROM nf
                          WHERE r = hit.r1 - 1) AS DOUBLE))
        END AS eff
    FROM t, hit)
"""
