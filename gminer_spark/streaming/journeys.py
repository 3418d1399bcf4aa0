"""User-journey analytics over the event log — transitions + funnels.

The two workhorse clickstream queries on a web property's event
stream:

* :func:`event_transitions` — the first-order Markov transition graph
  of event types: for every consecutive (prev -> next) pair inside a
  user's timeline, the count and the conditional probability
  P(next | prev) (micro-rounded; counts are exact integers).  This IS
  a link graph over behavior states — the same (src, dst, weight)
  shape the web host graph uses, feeding the same PageRank/SCC
  toolchain (e.g. absorbing-state detection on the condensation).
* :func:`funnel_counts` — ordered-step funnel: how many users
  completed step 1, then step 2 AFTER their step-1 time, etc.  The
  strict ``t_k > t_{k-1}`` chaining uses each user's EARLIEST
  qualifying time per step (the standard greedy funnel semantics —
  earliest-first maximizes completion and is order-deterministic).

Both are pure built-in SQL: one window (lag) partitioned by user for
transitions — a single shuffle on ``user_id`` — and K min-aggregate
joins for a K-step funnel, each keyed on ``user_id`` (co-partitioned
after the first shuffle; AQE-eligible).  Per-user timelines are
totally ordered by ``(ts, event_id)`` so ties cannot reorder across
engines.

Reference analog: none in GMiner (no event spine) — this extends the
engine's streaming/events family (`streaming/events.py`) with the
batch views a warehouse user expects next to windowed counts and
sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(events: DataFrame) -> DataFrame:
    """(prev_type, next_type, cnt, prob_micro) — consecutive event-
    type pairs per user timeline, with P(next | prev) micro-rounded."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("cnt"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("cnt").alias("tot"))
    return (
        pairs.join(totals, on="prev_type")
        .select(
            "prev_type",
            "next_type",
            "cnt",
            F.round(F.col("cnt") / F.col("tot") * 1e6, 0)
            .cast("long")
            .alias("prob_micro"),
        )
    )


def funnel_counts(events: DataFrame, steps: list[str]) -> DataFrame:
    """(step_idx, step, n_users) — users whose timeline contains the
    ordered step prefix with strictly increasing times (earliest
    qualifying occurrence per step)."""
    spark = events.sparkSession
    reached: DataFrame | None = None  # (user_id, t) at the previous step
    out_rows = []
    for i, step in enumerate(steps):
        ev = events.where(F.col("event_type") == step).select("user_id", "ts")
        if reached is None:
            cur = ev.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            cur = (
                ev.join(reached.withColumnRenamed("t", "prev_t"), on="user_id")
                .where(F.col("ts") > F.col("prev_t"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        cur = cur.localCheckpoint()  # K tiny user tables; single-ref chain
        out_rows.append((i + 1, step, cur.count()))
        reached = cur
    return spark.createDataFrame(
        out_rows, "step_idx int, step string, n_users long"
    )


def event_transitions_oracle_sql() -> str:
    return """
WITH ordered AS MATERIALIZED (
    SELECT user_id, event_type,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events),
pairs AS MATERIALIZED (
    SELECT prev_type, event_type AS next_type, COUNT(*) AS cnt
    FROM ordered WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type),
tot AS MATERIALIZED (
    SELECT prev_type, SUM(cnt) AS tot FROM pairs GROUP BY prev_type)
SELECT p.prev_type, p.next_type, CAST(p.cnt AS BIGINT) AS cnt,
       CAST(ROUND(CAST(p.cnt AS DOUBLE) / t.tot * 1e6) AS BIGINT)
           AS prob_micro
FROM pairs p JOIN tot t ON p.prev_type = t.prev_type"""


def funnel_oracle_sql(steps: list[str]) -> str:
    """Sequential min-after-previous CTE chain, one per step."""
    ctes = []
    for i, step in enumerate(steps):
        if i == 0:
            ctes.append(
                f"""s1 AS MATERIALIZED (
    SELECT user_id, MIN(ts) AS t FROM events
    WHERE event_type = '{step}' GROUP BY user_id)"""
            )
        else:
            ctes.append(
                f"""s{i + 1} AS MATERIALIZED (
    SELECT e.user_id, MIN(e.ts) AS t
    FROM events e JOIN s{i} p ON e.user_id = p.user_id
    WHERE e.event_type = '{step}' AND e.ts > p.t
    GROUP BY e.user_id)"""
            )
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({i + 1} AS INT) AS step_idx, '{step}' AS step, "
        f"CAST(COUNT(*) AS BIGINT) AS n_users FROM s{i + 1}"
        for i, step in enumerate(steps)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects
