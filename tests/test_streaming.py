"""Structured Streaming over events (memory sink) + batch equivalence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def events_rows():
    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = []
    for i in range(120):
        rows.append(
            (
                i,
                t0 + dt.timedelta(minutes=i),
                i % 5,
                ["view", "click", "buy"][i % 3],
                float(i),
                "{}",
            )
        )
    return rows


def test_windowed_counts_batch(spark):
    from gminer_spark.streaming.events import windowed_counts

    df = spark.createDataFrame(events_rows(), SCHEMA)
    got = {
        (r["window_start"].hour, r["event_type"]): r["n"]
        for r in windowed_counts(df, minutes=60).collect()
    }
    # 120 events over 2 hours, 3 types uniformly
    assert got[(10, "view")] == 20 and got[(11, "click")] == 20


def test_windowed_counts_streaming_matches_batch(spark, tmp_path):
    """readStream over parquet -> windowed agg -> memory sink must equal
    the batch computation (same input, complete mode)."""
    from gminer_spark.streaming.events import windowed_counts, windowed_counts_stream

    src = str(tmp_path / "events_src")
    df = spark.createDataFrame(events_rows(), SCHEMA)
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    agg = windowed_counts_stream(stream, minutes=60)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
            for r in spark.sql("SELECT * FROM win_out").collect()
        }
    finally:
        q.stop()
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_counts(df, minutes=60).collect()
    }
    assert got == want


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization equals batch sessionize."""
    from gminer_spark.streaming.events import sessionize, sessionize_stream

    src = str(tmp_path / "sess_src")
    df = spark.createDataFrame(events_rows(), SCHEMA)
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, session_id, n_events FROM sess_out"
        ).collect()
        # update mode can re-emit a session; keep the latest per key
        got = {}
        for r in rows:
            got[(r["user_id"], r["session_id"])] = r["n_events"]
    finally:
        q.stop()
    want = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got == want


def test_sessionize(spark):
    from gminer_spark.streaming.events import sessionize

    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        # user 1: two sessions split by a 2h gap
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=5), 1, "view", 1.0, "{}"),
        (3, t0 + dt.timedelta(hours=3), 1, "buy", 1.0, "{}"),
        # user 2: one session
        (4, t0, 2, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_dedup_events_batch_earliest_wins(spark):
    from gminer_spark.streaming.events import dedup_events

    rows = events_rows()
    # inject retries: duplicates of event 0 later in the same hour
    t0 = rows[0][1]
    rows += [
        (1000, t0 + dt.timedelta(seconds=30), 0, "view", 999.0, "{}"),
        (1001, t0 + dt.timedelta(minutes=5, seconds=30), 0, "view", 999.0, "{}"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = dedup_events(df, granularity="hour").collect()
    keys = {}
    for r in got:
        k = (r["user_id"], r["event_type"], r["ts"].replace(minute=0, second=0))
        assert k not in keys  # one row per key
        keys[k] = r
    # earliest event of the retried key wins (event_id 0, value 0.0)
    winner = keys[(0, "view", t0.replace(minute=0, second=0))]
    assert winner["event_id"] == 0 and winner["value"] == 0.0


def test_dedup_events_stream_one_row_per_key(spark, tmp_path):
    from gminer_spark.streaming.events import dedup_events_stream

    src = str(tmp_path / "dedup_src")
    df = spark.createDataFrame(events_rows(), SCHEMA)
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        dedup_events_stream(stream, granularity="hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM dedup_out").collect()
    finally:
        q.stop()
    keys = [
        (r["user_id"], r["event_type"], r["ts"].replace(minute=r["ts"].minute // 60, second=0))
        for r in rows
    ]
    hour_keys = [
        (r["user_id"], r["event_type"], r["ts"].replace(minute=0, second=0))
        for r in rows
    ]
    assert len(hour_keys) == len(set(hour_keys))  # one row per key
    input_ids = {r[0] for r in events_rows()}
    assert all(r["event_id"] in input_ids for r in rows)  # subset of input


def test_cc_maintainer_foreachbatch_matches_batch(spark, tmp_path):
    """Structured-streaming CC maintenance: edge batches arrive as
    parquet files; foreachBatch folds each into the labeling via
    incremental_cc.  Final labels must equal a one-shot batch CC."""
    from tests.conftest import random_graph

    from gminer_spark.graph.cc import CCMaintainer, connected_components

    pairs = random_graph(n=120, p=0.02, seed=33)
    halves = [pairs[0::2], pairs[1::2]]
    src = str(tmp_path / "edge_batches")
    for i, batch in enumerate(halves):
        spark.createDataFrame(
            [(int(s), int(d)) for s, d in batch], "src long, dst long"
        ).coalesce(1).write.mode("append").parquet(src)

    m = CCMaintainer()
    stream = spark.readStream.schema("src long, dst long").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = stream.writeStream.foreachBatch(
        lambda batch, _id: (m.update(batch), None)[1]
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["id"]: r["component"] for r in m.labels.collect()}
    edges = spark.createDataFrame(
        [(int(s), int(d)) for s, d in pairs], "src long, dst long"
    )
    want = {
        r["id"]: r["component"]
        for r in connected_components(edges).state.collect()
    }
    assert got == want


def _dedup_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_maintainer_invariant_and_batch1_semantics(spark):
    """Batch 1 admits exactly the dedup_clusters canonicals; after any
    number of batches NO two admitted docs share an LSH band bucket."""
    from gminer_spark.textops.dedup import DedupMaintainer, band_buckets

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows1 = [
        (1, base),
        (2, base),                       # near-dup of 1 -> rejected
        (3, "one two three four five six seven eight"),
    ]
    rows2 = [
        (4, base),                       # collides with admitted 1 -> rejected
        (5, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
    ]
    m = DedupMaintainer()
    a1 = {r["doc_id"] for r in m.update(_dedup_docs(spark, rows1)).collect()}
    assert a1 == {1, 3}
    a2 = {r["doc_id"] for r in m.update(_dedup_docs(spark, rows2)).collect()}
    assert a2 == {5}
    # pairwise band-disjoint invariant over the admitted union
    admitted_docs = _dedup_docs(
        spark, [r for r in rows1 + rows2 if r[0] in a1 | a2]
    )
    from pyspark.sql import functions as F

    b = band_buckets(admitted_docs)
    collisions = (
        b.alias("x")
        .join(b.alias("y"), on=["band", "bsig"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .count()
    )
    assert collisions == 0


def test_dedup_maintainer_foreachbatch_stream(spark, tmp_path):
    """Document batches through a real readStream/foreachBatch loop:
    the admitted set equals driving the maintainer by hand."""
    from gminer_spark.textops.dedup import DedupMaintainer

    rows = [
        (i, f"word{i} common text body shared tokens run {i % 3}")
        for i in range(12)
    ]
    src = str(tmp_path / "doc_batches")
    for half in (rows[0::2], rows[1::2]):
        _dedup_docs(spark, half).coalesce(1).write.mode("append").parquet(src)

    admitted: list[set] = []
    m = DedupMaintainer()

    def fold(batch, _id):
        if not batch.isEmpty():
            admitted.append({r["doc_id"] for r in m.update(batch).collect()})

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = stream.writeStream.foreachBatch(fold).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = set().union(*admitted) if admitted else set()
    m2 = DedupMaintainer()
    want = set()
    for half in (rows[0::2], rows[1::2]):
        want |= {
            r["doc_id"] for r in m2.update(_dedup_docs(spark, half)).collect()
        }
    assert got == want and got


def test_dedup_maintainer_short_doc_exact_path(spark):
    """Sub-shingle documents (< shingle_n tokens, so no LSH buckets)
    dedup by exact md5(text): min doc_id wins within a batch, and the
    admitted-hash index rejects repeats in later batches (ADVICE r3).
    Distinct short texts and normal long docs are unaffected."""
    from gminer_spark.textops.dedup import DedupMaintainer

    long_doc = "alpha beta gamma delta epsilon zeta eta theta"
    rows1 = [
        (3, "hi there"),       # short, dup of 7 -> min id 3 admitted
        (7, "hi there"),
        (4, "bye"),            # short, unique -> admitted
        (9, long_doc),         # long path untouched
    ]
    rows2 = [
        (11, "hi there"),      # exact index hit -> rejected
        (12, "new words"),     # short, fresh -> admitted
        (13, "bye"),           # exact index hit -> rejected
    ]
    m = DedupMaintainer(shingle_n=3)
    a1 = {r["doc_id"] for r in m.update(_dedup_docs(spark, rows1)).collect()}
    assert a1 == {3, 4, 9}
    a2 = {r["doc_id"] for r in m.update(_dedup_docs(spark, rows2)).collect()}
    assert a2 == {12}


def test_dedup_maintainer_contamination_gate(spark):
    """With a benchmark corpus attached, documents over the n-gram
    overlap threshold are dropped before dedup; clean docs still flow."""
    from gminer_spark.textops.dedup import DedupMaintainer

    bench = _dedup_docs(
        spark, [(100, "secret eval question one two three four five")]
    )
    rows = [
        # 5 shingles (12 tokens, n=8), 1 contaminated -> ratio 0.2 > 0.05
        (1, "secret eval question one two three four five plus extra tail words"),
        (2, "totally clean document body with its own eight plus tokens here"),
    ]
    m = DedupMaintainer(benchmark=bench, max_contamination=0.05)
    a = {r["doc_id"] for r in m.update(_dedup_docs(spark, rows)).collect()}
    assert a == {2}
    # without the gate both are admitted (they are not near-dups)
    m2 = DedupMaintainer()
    a2 = {r["doc_id"] for r in m2.update(_dedup_docs(spark, rows)).collect()}
    assert a2 == {1, 2}


# -- journeys: transitions + funnel ------------------------------------------


def _mk_events(spark, rows):
    import datetime as dt

    data = [
        (eid, dt.datetime(2026, 1, 1, 0, 0, sec), uid, et, 1.0, "{}")
        for eid, (sec, uid, et) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_event_transitions_counts_and_probs(spark):
    from gminer_spark.streaming.journeys import event_transitions

    ev = _mk_events(
        spark,
        [
            (1, 1, "view"), (2, 1, "click"), (3, 1, "view"), (4, 1, "click"),
            (1, 2, "view"), (2, 2, "purchase"),
        ],
    )
    got = {
        (r.prev_type, r.next_type): (r.cnt, r.prob_micro)
        for r in event_transitions(ev).collect()
    }
    assert got[("view", "click")] == (2, round(2 / 3 * 1e6))
    assert got[("view", "purchase")] == (1, round(1 / 3 * 1e6))
    assert got[("click", "view")] == (1, 1_000_000)
    assert len(got) == 3


def test_event_funnel_strict_ordering(spark):
    from gminer_spark.streaming.journeys import funnel_counts

    ev = _mk_events(
        spark,
        [
            # user 1 completes in order
            (1, 1, "view"), (2, 1, "click"), (3, 1, "purchase"),
            # user 2: purchase BEFORE click — completes only 2 steps
            (1, 2, "view"), (2, 2, "purchase"), (3, 2, "click"),
            # user 3: click only — no view, contributes to no step
            (1, 3, "click"),
        ],
    )
    got = {r.step: r.n_users for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 2, "click": 2, "purchase": 1}


def test_behavior_pagerank_uniform_on_symmetric_transitions(spark):
    """A perfectly symmetric 2-state flip graph must rank both states
    equally; an absorbing-heavy state must rank higher."""
    from pyspark.sql import functions as F

    from gminer_spark.graph.pagerank import pagerank
    from gminer_spark.streaming.journeys import event_transitions

    ev = _mk_events(
        spark,
        [(i, 1, "a" if i % 2 else "b") for i in range(1, 21)],
    )
    tr = event_transitions(ev).where(F.col("prev_type") != F.col("next_type"))
    from gminer_spark.functions import h32

    edges = tr.select(
        h32(F.col("prev_type")).alias("src"),
        h32(F.col("next_type")).alias("dst"),
        F.col("cnt").cast("double").alias("w"),
    )
    pr = {r.id: r.rank for r in pagerank(edges, num_iter=10, weight_col="w").state.collect()}
    vals = sorted(pr.values())
    assert abs(vals[0] - vals[1]) < 1e-9 and abs(sum(vals) - 1.0) < 1e-6


def test_event_bursts_hand_values(spark):
    """Hand timeline: steady 2/hour then a 9-spike; the spike bursts
    (9*3 >= 3*6), the warm-up hours carry no verdict, a zero-history
    spike below min_count is suppressed."""
    import datetime as dt

    from gminer_spark.streaming.bursts import event_bursts

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # type A: hours 0-3 have 2 events each; hour 4 has 9 (burst)
    for h, n in [(0, 2), (1, 2), (2, 2), (3, 2), (4, 9)]:
        rows += [("A", base + dt.timedelta(hours=h, minutes=i)) for i in range(n)]
    # type B: quiet then a 4-spike at hour 4 (< min_count 5: suppressed)
    rows += [("B", base)]
    rows += [("B", base + dt.timedelta(hours=4, minutes=i)) for i in range(4)]
    ev = spark.createDataFrame(
        [(i, t, 1, ty, 0.0, "") for i, (ty, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {
        (r["event_type"], r["hour_ts"]): (r["cnt"], r["prev_sum"])
        for r in event_bursts(ev, factor=3, m=3, min_count=5).collect()
    }
    assert got == {("A", "2024-01-01 04:00"): (9, 6)}


def test_last_touch_attribution_hand_values(spark):
    """User 1: click then purchase (attributed), then a purchase 2
    days later (outside the 24h window: -1); user 2: purchase with no
    touch (-1); latest of two touches wins."""
    import datetime as dt

    from gminer_spark.streaming.bursts import last_touch_attribution

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "view", 0.0, ""),
        (2, t0 + dt.timedelta(minutes=5), 1, "click", 0.0, ""),
        (3, t0 + dt.timedelta(minutes=10), 1, "purchase", 9.0, ""),
        (4, t0 + dt.timedelta(days=2), 1, "purchase", 9.0, ""),
        (5, t0, 2, "purchase", 5.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["conversion_id"]: (r["touch_id"], r["touch_type"])
        for r in last_touch_attribution(ev).collect()
    }
    assert got[3] == (2, "click")  # latest touch wins over the view
    assert got[4] == (-1, "none")  # outside the 24h window
    assert got[5] == (-1, "none")  # no touch at all


def test_first_touch_attribution_hand_values(spark):
    """View then click then purchase: FIRST touch (the view) wins —
    the dual of last-touch; outside-window touches excluded."""
    import datetime as dt

    from gminer_spark.streaming.bursts import first_touch_attribution

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "view", 0.0, ""),
        (2, t0 + dt.timedelta(minutes=5), 1, "click", 0.0, ""),
        (3, t0 + dt.timedelta(minutes=10), 1, "purchase", 9.0, ""),
        (6, t0 - dt.timedelta(days=3), 4, "click", 0.0, ""),
        (7, t0, 4, "purchase", 9.0, ""),  # only touch is 3 days old
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["conversion_id"]: (r["touch_id"], r["touch_type"])
        for r in first_touch_attribution(ev).collect()
    }
    assert got[3] == (1, "view")
    assert got[7] == (-1, "none")
