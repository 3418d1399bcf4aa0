"""Dump .explain("formatted") plans for the round-6 optimization targets.

Usage:  python tools/dump_plans_r06.py <tag> [query ...]

Writes plans/r06/<query>_<tag>.txt for each requested query (default:
all).  ``tag`` is "before" or "after".  For one-shot queries the full
query plan is captured; for iterative algorithms the representative
REPEATED-ROUND plan is captured (that is the plan whose shape the
optimization changes — the final state is a plain LogicalRDD leaf).
Runs at sf0.01 where the algorithm must execute to build the plan
(plan SHAPE is scale-invariant; wall-time numbers live in bench logs).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")


def _explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def build_targets(spark):
    """name -> (header, fn building the DataFrame to explain)."""
    from pyspark.sql import functions as F

    from gminer_spark.graph import tables as gt

    def edges_small():
        return gt.copurchase_edges(spark, SF_SMALL)

    targets = {}

    # coreness: the final state is a LogicalRDD leaf, so capture the
    # representative repeated-ROUND plan by reconstructing one round
    # inline (mirrors kcore.coreness_hindex's h_step composition).
    def coreness_inline():
        from pyspark.sql import Window

        sym = gt.symmetrize(edges_small()).persist()
        state = (
            sym.groupBy(F.col("src").alias("id"))
            .agg(F.count("*").cast("long").alias("val"))
            .localCheckpoint()
        )
        w = (
            Window.partitionBy("id")
            .orderBy(F.desc("val"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

        def h_step(cur):
            e, st = sym.alias("e"), cur.alias("st")
            hist = (
                e.join(st, F.col("e.dst") == F.col("st.id"))
                .groupBy(F.col("e.src").alias("id"), F.col("st.val").alias("val"))
                .agg(F.count("*").alias("cnt"))
            )
            new_vals = (
                hist.withColumn("cum", F.sum("cnt").over(w))
                .groupBy("id")
                .agg(F.max(F.least(F.col("cum"), F.col("val"))).cast("long").alias("nv"))
            )
            return (
                cur.withColumnRenamed("val", "prev")
                .join(new_vals, on="id")
                .select("id", F.coalesce("nv", "prev").alias("val"))
            )

        from gminer_spark.graph import kcore

        steps = getattr(kcore, "_HSTEPS_PER_ROUND", 2)
        cur = state
        for s in range(steps):
            cur = h_step(cur)
            if s < steps - 1 and hasattr(kcore, "_HSTEPS_PER_ROUND"):
                cur = gt.plan_barrier(cur, eager=False)
        merged = (
            state.withColumnRenamed("val", "old")
            .join(cur, on="id")
            .select("id", "val", "old")
        )
        return merged

    def betweenness_q():
        from gminer_spark.graph.betweenness import betweenness_sampled

        e = edges_small()
        seeds = gt.vertices(gt.symmetrize(e)).where(F.col("id") % 499 == 0)
        return betweenness_sampled(e, seeds, max_depth=5)

    def mis_q():
        from gminer_spark.graph.mis import maximal_independent_set

        return maximal_independent_set(edges_small())

    def random_walks_q():
        from gminer_spark.graph.walks import random_walks

        return random_walks(edges_small(), walk_len=3, walks_per_vertex=1)

    def node2vec_q():
        from gminer_spark.graph.walks import random_walks_node2vec

        return random_walks_node2vec(
            edges_small(), walk_len=3, walks_per_vertex=1, ret_bias=4, in_bias=2
        )

    def pattern_match_q():
        from gminer_spark.contract import build_queries

        return build_queries()["pattern_match"](spark, SF_SMALL)

    def vocab_growth_q():
        from gminer_spark.contract import build_queries

        return build_queries()["vocab_growth"](spark, SF_SMALL)

    def triangles_q():
        from gminer_spark.graph.triangles import _wedge_closed

        return _wedge_closed(edges_small(), "degree").agg(F.count("*"))

    def pagerank_q():
        from gminer_spark.graph.pagerank import pagerank

        return pagerank(edges_small(), num_iter=3).state

    def minhash_q():
        from gminer_spark.textops.dedup import minhash_lsh_pairs

        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        return minhash_lsh_pairs(docs, num_hashes=16, bands=4)

    def mining_egonets_q():
        from gminer_spark.graph.mining import _seed_egonets

        return _seed_egonets(edges_small())

    targets["coreness_round"] = (
        "coreness_hindex: one composed free-running ROUND plan "
        "(state -> merged (id, val, old)); the loop repeats this",
        coreness_inline,
    )
    targets["betweenness"] = (
        "betweenness_sampled full result plan (BFS levels appear as leaves "
        "after per-level materialization)",
        betweenness_q,
    )
    targets["mis"] = ("maximal_independent_set result plan", mis_q)
    targets["random_walks3"] = ("random_walks walk_len=3 result plan", random_walks_q)
    targets["node2vec3"] = ("random_walks_node2vec walk_len=3 result plan", node2vec_q)
    targets["pattern_match"] = ("pattern_match contract query plan", pattern_match_q)
    targets["vocab_growth"] = ("vocab_growth contract query plan", vocab_growth_q)
    targets["triangles"] = ("triangle_count wedge-join plan", triangles_q)
    targets["pagerank"] = (
        "pagerank num_iter=3 final state (leaf; round shape in kcore-style loops)",
        pagerank_q,
    )
    targets["minhash_lsh"] = (
        "minhash_lsh_pairs candidate-pair plan", minhash_q
    )
    targets["mining_egonets"] = (
        "_seed_egonets plan (shared by max_clique/communities)",
        mining_egonets_q,
    )
    return targets


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)

    from gminer_spark.session import get_spark

    spark = get_spark(app_name=f"dump_plans_{tag}", master="local[8]")
    targets = build_targets(spark)
    for name, (header, fn) in targets.items():
        if only and name not in only:
            continue
        try:
            df = fn()
            txt = _explain_str(df)
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR building plan: {exc!r}\n"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"== {name} ({tag}) ==\n{header}\n\n{txt}")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
