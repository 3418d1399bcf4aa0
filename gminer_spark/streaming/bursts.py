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


ATTR_PACK = 10_000_000  # event_id < 1e7 at contract scale; at web
# scale pack into a struct-max instead (documented)


def last_touch_attribution(
    events: DataFrame,
    touch_types: tuple = ("view", "click"),
    conversion_type: str = "purchase",
    window_s: int = 86_400,
) -> DataFrame:
    """Last-touch conversion attribution: for every conversion event,
    the most recent SAME-USER touch event (view/click) within
    ``window_s`` seconds — the marketing-analytics primitive over the
    same events table the sessionizers use.

    Portable exactness: the "latest preceding touch" is a running MAX
    over a packed BIGINT key ``t·1e7 + event_id`` (monotone in the
    (t, event_id) total order) restricted to touch rows — no
    LAST_VALUE IGNORE NULLS (engine-dependent) and no per-row
    subqueries; one per-user window, frame UNBOUNDED PRECEDING..1
    PRECEDING.  Conversions with no in-window touch carry -1
    sentinels.  Timestamps emitted as formatted strings (house rule).
    """
    from pyspark.sql import Window as W

    ev = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("t"),
    ).where(
        F.col("event_type").isin(list(touch_types) + [conversion_type])
    )
    packed = F.when(
        F.col("event_type").isin(list(touch_types)),
        F.col("t") * ATTR_PACK + F.col("event_id"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("t") * ATTR_PACK + F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    scored = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "t",
        F.max(packed).over(w).alias("touch_key"),
    ).where(F.col("event_type") == conversion_type)
    attributed = scored.select(
        F.col("event_id").alias("conversion_id"),
        "user_id",
        F.from_unixtime("t", "yyyy-MM-dd HH:mm:ss").alias("conversion_ts"),
        F.when(
            F.col("touch_key").isNotNull()
            # integer `div`, not floor(x/PACK): the packed key
            # (~1.7e16) exceeds double's 2^53 exact-integer range
            & (
                F.col("t") - F.expr(f"touch_key div {ATTR_PACK}")
                <= window_s
            ),
            (F.col("touch_key") % ATTR_PACK),
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("touch_id"),
    )
    touch = events.select(
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.from_unixtime(
            F.unix_timestamp("ts").cast("long"), "yyyy-MM-dd HH:mm:ss"
        ).alias("touch_ts"),
    )
    return attributed.join(touch, on="touch_id", how="left").select(
        "conversion_id",
        "user_id",
        "conversion_ts",
        "touch_id",
        F.coalesce("touch_type", F.lit("none")).alias("touch_type"),
        F.coalesce("touch_ts", F.lit("")).alias("touch_ts"),
    )


def last_touch_attribution_oracle_sql(
    touch_types: tuple = ("view", "click"),
    conversion_type: str = "purchase",
    window_s: int = 86_400,
) -> str:
    """DuckDB mirror over the ``events`` view — identical packed-key
    running max, window frame, and sentinels."""
    tt = ", ".join(f"'{t}'" for t in touch_types)
    return f"""
WITH ev AS MATERIALIZED (
    SELECT event_id, user_id, event_type,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
    FROM events
    WHERE event_type IN ({tt}, '{conversion_type}')),
scored AS MATERIALIZED (
    SELECT event_id, user_id, event_type, t,
           MAX(CASE WHEN event_type IN ({tt})
                    THEN t * {ATTR_PACK} + event_id END)
               OVER (PARTITION BY user_id
                     ORDER BY t * {ATTR_PACK} + event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_key
    FROM ev),
attributed AS MATERIALIZED (
    SELECT event_id AS conversion_id, user_id,
           strftime(to_timestamp(t), '%Y-%m-%d %H:%M:%S')
               AS conversion_ts,
           CAST(CASE WHEN touch_key IS NOT NULL
                      AND t - (touch_key // {ATTR_PACK}) <= {window_s}
                     THEN touch_key % {ATTR_PACK} ELSE -1 END AS BIGINT)
               AS touch_id
    FROM scored WHERE event_type = '{conversion_type}')
SELECT a.conversion_id, a.user_id, a.conversion_ts, a.touch_id,
       COALESCE(e.event_type, 'none') AS touch_type,
       COALESCE(strftime(to_timestamp(CAST(FLOOR(epoch(e.ts)) AS BIGINT)),
                         '%Y-%m-%d %H:%M:%S'), '') AS touch_ts
FROM attributed a
LEFT JOIN events e ON e.event_id = a.touch_id"""


def first_touch_attribution(
    events: DataFrame,
    touch_types: tuple = ("view", "click"),
    conversion_type: str = "purchase",
    window_s: int = 86_400,
) -> DataFrame:
    """First-touch dual of :func:`last_touch_attribution`: the
    EARLIEST same-user touch within the window before each conversion
    (campaign-origin attribution).  Same packed-key discipline, but a
    RANGE frame — ``window_s·PACK PRECEDING .. 1 PRECEDING`` over the
    packed order — with MIN, so only in-window touches are candidates
    (the last-touch MAX could use an unbounded frame because later
    always wins; the earliest in-window touch needs the range
    bound)."""
    from pyspark.sql import Window as W

    ev = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("t"),
    ).where(
        F.col("event_type").isin(list(touch_types) + [conversion_type])
    )
    packed = F.when(
        F.col("event_type").isin(list(touch_types)),
        F.col("t") * ATTR_PACK + F.col("event_id"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("t") * ATTR_PACK + F.col("event_id"))
        .rangeBetween(-window_s * ATTR_PACK, -1)
    )
    scored = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "t",
        F.min(packed).over(w).alias("touch_key"),
    ).where(F.col("event_type") == conversion_type)
    attributed = scored.select(
        F.col("event_id").alias("conversion_id"),
        "user_id",
        F.from_unixtime("t", "yyyy-MM-dd HH:mm:ss").alias("conversion_ts"),
        F.coalesce(
            F.col("touch_key") % ATTR_PACK, F.lit(-1)
        ).cast("long").alias("touch_id"),
    )
    touch = events.select(
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.from_unixtime(
            F.unix_timestamp("ts").cast("long"), "yyyy-MM-dd HH:mm:ss"
        ).alias("touch_ts"),
    )
    return attributed.join(touch, on="touch_id", how="left").select(
        "conversion_id",
        "user_id",
        "conversion_ts",
        "touch_id",
        F.coalesce("touch_type", F.lit("none")).alias("touch_type"),
        F.coalesce("touch_ts", F.lit("")).alias("touch_ts"),
    )


def first_touch_attribution_oracle_sql(
    touch_types: tuple = ("view", "click"),
    conversion_type: str = "purchase",
    window_s: int = 86_400,
) -> str:
    """DuckDB mirror — identical packed-key RANGE frame and MIN."""
    tt = ", ".join(f"'{t}'" for t in touch_types)
    return f"""
WITH ev AS MATERIALIZED (
    SELECT event_id, user_id, event_type,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
    FROM events
    WHERE event_type IN ({tt}, '{conversion_type}')),
scored AS MATERIALIZED (
    SELECT event_id, user_id, event_type, t,
           MIN(CASE WHEN event_type IN ({tt})
                    THEN t * {ATTR_PACK} + event_id END)
               OVER (PARTITION BY user_id
                     ORDER BY t * {ATTR_PACK} + event_id
                     RANGE BETWEEN CAST({window_s} AS BIGINT) * {ATTR_PACK} PRECEDING
                           AND 1 PRECEDING)
               AS touch_key
    FROM ev)
SELECT s.event_id AS conversion_id, s.user_id,
       strftime(to_timestamp(s.t), '%Y-%m-%d %H:%M:%S') AS conversion_ts,
       CAST(COALESCE(s.touch_key % {ATTR_PACK}, -1) AS BIGINT) AS touch_id,
       COALESCE(e.event_type, 'none') AS touch_type,
       COALESCE(strftime(to_timestamp(CAST(FLOOR(epoch(e.ts)) AS BIGINT)),
                         '%Y-%m-%d %H:%M:%S'), '') AS touch_ts
FROM scored s
LEFT JOIN events e ON e.event_id = s.touch_key % {ATTR_PACK}
WHERE s.event_type = '{conversion_type}'"""
