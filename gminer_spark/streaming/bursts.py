"""Burst detection over an event stream: per (event_type, hour),
flag hours whose count exceeds ``factor`` × the trailing ``m``-hour
mean — the ops-alerting / trending-topic primitive over the same
events table the sessionizers use.

Exact-integer rule (no float means): with cnt the hour's count and
prev_sum the sum of the previous ``m`` hours,

    burst  ⇔  cnt ≥ min_count  AND  cnt·m ≥ factor·prev_sum

evaluated on a DENSE hour grid (missing hours count 0 — a lag over
existing rows only would silently skip gaps and compare against the
wrong window).  The first ``m`` hours carry no verdict (incomplete
history).  ``min_count`` suppresses the zero-history trivial burst.

Scale shape: one count shuffle keyed by (type, hour), a broadcast
1-row min/max-hour aggregate, a types × hours grid (types are
bounded; hours are the stream length), and a per-type window over the
grid — at web scale the partition key is the type, each partition a
time series.  Timestamps are emitted as formatted strings (house
determinism rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_bursts(
    events: DataFrame,
    factor: int = 3,
    m: int = 3,
    min_count: int = 5,
) -> DataFrame:
    """(event_type, hour_ts, cnt, prev_sum) — the burst hours."""
    ev = events.select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
    )
    cnts = ev.groupBy("event_type", "h").agg(
        F.count("*").cast("long").alias("cnt")
    )
    bounds = ev.agg(
        F.min("h").alias("hmin"), F.max("h").alias("hmax")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence("hmin", "hmax")).alias("h"),
        "hmin",
    )
    dense = grid.join(cnts, on=["event_type", "h"], how="left").select(
        "event_type",
        "h",
        "hmin",
        F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-m, -1)
    )
    scored = dense.select(
        "event_type",
        "h",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("prev_sum"),
        (F.col("h") >= F.col("hmin") + m).alias("full_history"),
    )
    return scored.where(
        F.col("full_history")
        & (F.col("cnt") >= min_count)
        & (F.col("cnt") * m >= factor * F.col("prev_sum"))
    ).select(
        "event_type",
        F.from_unixtime(F.col("h") * 3600, "yyyy-MM-dd HH:00").alias(
            "hour_ts"
        ),
        "cnt",
        "prev_sum",
    )


def event_bursts_oracle_sql(
    factor: int = 3, m: int = 3, min_count: int = 5
) -> str:
    """DuckDB mirror over the ``events`` view — identical dense grid,
    window frame, and integer burst rule."""
    return f"""
WITH ev AS MATERIALIZED (
    SELECT event_type,
           CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h
    FROM events),
cnts AS MATERIALIZED (
    SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ev GROUP BY 1, 2),
bounds AS MATERIALIZED (SELECT MIN(h) AS hmin, MAX(h) AS hmax FROM ev),
grid AS MATERIALIZED (
    SELECT t.event_type, CAST(g.h AS BIGINT) AS h, b.hmin
    FROM (SELECT DISTINCT event_type FROM ev) t
    CROSS JOIN bounds b
    CROSS JOIN UNNEST(range(b.hmin, b.hmax + 1)) AS g(h)),
dense AS MATERIALIZED (
    SELECT g.event_type, g.h, g.hmin,
           COALESCE(c.cnt, 0) AS cnt
    FROM grid g LEFT JOIN cnts c
    ON c.event_type = g.event_type AND c.h = g.h),
scored AS MATERIALIZED (
    SELECT event_type, h, cnt, hmin,
           CAST(COALESCE(SUM(cnt) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN {m} PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS prev_sum
    FROM dense)
SELECT event_type,
       strftime(to_timestamp(h * 3600), '%Y-%m-%d %H:00') AS hour_ts,
       cnt, prev_sum
FROM scored
WHERE h >= hmin + {m}
  AND cnt >= {min_count}
  AND cnt * {m} >= {factor} * prev_sum"""
