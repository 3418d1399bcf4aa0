"""Per-partition CSR adjacency blocks — the engine's core data structure.

The reference's per-worker state is a ``VertexTable`` hash map of
vertices with sorted adjacency lists
(/root/reference/core/vertex_table.hpp:18-39; sorted at parse time,
apps/trianglecount.cpp:176).  Our equivalent is a ``csr_blocks``
DataFrame — one row per partition block:

    block_id:int, vids:array<long>, indptr:array<long>, indices:array<long>

``vids`` sorted ascending; ``indices[indptr[i]:indptr[i+1]]`` are the
(sorted) out-neighbors of ``vids[i]``.  Block membership is
``pmod(src, n_blocks)`` — a pure function of the id, like the
reference's ``DefaultHash`` ownership
(/root/reference/partition/BVertex.tpp:6-13), so any operator can
compute a row's owner without a lookup table.

Blocks are built with ``applyInPandas`` (one Arrow batch per block,
no per-row Python) and consumed by vectorized numpy gather-scatter
kernels (blocked PageRank below).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.graph import tables

CSR_SCHEMA = (
    "block_id int, vids array<long>, indptr array<long>, indices array<long>"
)


def dense_block_map(block_map: DataFrame) -> DataFrame:
    """(id, block:int) — remap arbitrary block labels (e.g. the Voronoi
    partitioner's offset namespaces) to dense ints, deterministically
    (dense_rank over label)."""
    from pyspark.sql import Window

    labels = block_map.select(F.col("block").alias("label")).distinct()
    dense = labels.withColumn(
        "block",
        (F.dense_rank().over(Window.orderBy("label")) - 1).cast("int"),
    )
    return block_map.select("id", F.col("block").alias("label")).join(
        dense, on="label"
    ).select("id", "block")


def build_csr_blocks(
    edges: DataFrame,
    n_blocks: int = 32,
    all_vertices: DataFrame | None = None,
    block_map: DataFrame | None = None,
) -> DataFrame:
    """Build CSR blocks from directed ``edges(src, dst)``.

    ``all_vertices`` (optional ``id`` column) forces rows for vertices
    with no out-edges (empty adjacency) so downstream state arrays are
    complete — the dangling vertices PageRank must still hold rank for.

    ``block_map`` (optional ``(id, block:int)``) overrides the default
    ``pmod(id, n_blocks)`` ownership with data-driven locality blocks
    (the BDG partitioner's output, graph/partitioning.py) — the analog
    of the reference's owner-annotated adjacency format
    (partition/BDGPartitioner.tpp:339-350).  Every vertex must appear
    in the map.
    """
    if block_map is None:
        e = edges.select(
            F.pmod(F.col("src"), F.lit(n_blocks)).cast("int").alias("block_id"),
            "src",
            "dst",
        )
    else:
        e = edges.join(
            block_map.withColumnRenamed("id", "src"), on="src"
        ).select(F.col("block").cast("int").alias("block_id"), "src", "dst")
    if all_vertices is None:
        all_vertices = tables.vertices(edges)
    if block_map is None:
        verts = all_vertices.select(
            F.pmod(F.col("id"), F.lit(n_blocks)).cast("int").alias("block_id"),
            F.col("id").alias("src"),
            F.lit(None).cast("long").alias("dst"),
        )
    else:
        verts = all_vertices.join(block_map, on="id").select(
            F.col("block").cast("int").alias("block_id"),
            F.col("id").alias("src"),
            F.lit(None).cast("long").alias("dst"),
        )

    def to_csr(pdf: pd.DataFrame) -> pd.DataFrame:
        block_id = int(pdf["block_id"].iloc[0])
        real = pdf.dropna(subset=["dst"])
        vids = np.sort(pdf["src"].unique().astype(np.int64))
        src = real["src"].to_numpy(np.int64)
        dst = real["dst"].to_numpy(np.int64)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        counts = np.zeros(len(vids), dtype=np.int64)
        pos = np.searchsorted(vids, src)
        np.add.at(counts, pos, 1)
        indptr = np.concatenate(([0], np.cumsum(counts)))
        return pd.DataFrame(
            {
                "block_id": [block_id],
                "vids": [vids.tolist()],
                "indptr": [indptr.tolist()],
                "indices": [dst.tolist()],
            }
        )

    both = e.unionByName(verts)
    return both.groupBy("block_id").applyInPandas(to_csr, CSR_SCHEMA)


def csr_block_stats(blocks: DataFrame) -> DataFrame:
    """Per-block (n_vertices, n_edges) — the reference's partition
    stats output (/root/reference/partition/BPartitioner.tpp:454-486)."""
    return blocks.select(
        "block_id",
        F.size("vids").cast("long").alias("n_vertices"),
        F.size("indices").cast("long").alias("n_edges"),
    )


def pagerank_blocked(
    edges: DataFrame,
    n_blocks: int = 32,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    num_iter: int | None = None,
    block_map: DataFrame | None = None,
) -> DataFrame:
    """Blocked PageRank: per-block numpy gather-scatter kernels.

    The GMiner-style execution: rank state lives as per-block arrays
    aligned with the CSR ``vids``; each superstep every block scatters
    ``rank/out_deg`` onto its local ``indices`` with ``np.add.at`` and
    emits **pre-aggregated** (dst, partial) rows — one row per distinct
    destination per block, the map-side combine the reference gets
    from ``Vecs`` (/root/reference/util/vecs.tpp:79-107).  The shuffle
    then only carries O(boundary) partials, not O(edges) messages.

    Returns the converged ``(id, rank)`` DataFrame.
    """
    spark = edges.sparkSession
    if block_map is not None:
        # keyed by the per-superstep join key (dst) and persisted, so
        # every superstep shuffles only the (combined, small) contribs
        # side; under the broadcast gate it is map-side entirely
        block_map = (
            block_map.withColumnRenamed("id", "dst")
            .repartition(tables.shuffle_partitions(spark), "dst")
            .persist()
        )
        n_map = block_map.count()
    blocks = build_csr_blocks(
        edges,
        n_blocks=n_blocks,
        block_map=(
            block_map.withColumnRenamed("dst", "id") if block_map is not None else None
        ),
    ).persist()
    n = int(blocks.agg(F.sum(F.size("vids"))).first()[0])
    teleport = (1.0 - damping) / n

    # state: block_id, vids (sorted), ranks aligned to vids
    state = blocks.select(
        "block_id",
        "vids",
        F.transform("vids", lambda _: F.lit(1.0 / n)).alias("ranks"),
    )

    scatter_schema = "dst long, partial double"
    state_schema = "block_id int, vids array<long>, ranks array<double>"

    for k in range(1, (num_iter or max_iter) + 1):
        joined = state.join(blocks.drop("vids"), on="block_id")

        def scatter(pdf: pd.DataFrame) -> pd.DataFrame:
            outs: list[pd.DataFrame] = []
            for _, row in pdf.iterrows():
                vids = np.asarray(row["vids"], dtype=np.int64)
                ranks = np.asarray(row["ranks"], dtype=np.float64)
                indptr = np.asarray(row["indptr"], dtype=np.int64)
                indices = np.asarray(row["indices"], dtype=np.int64)
                out_deg = np.diff(indptr)
                # dangling mass emitted under sentinel dst = -1
                dmass = ranks[out_deg == 0].sum()
                w = np.zeros(len(vids))
                nz = out_deg > 0
                w[nz] = ranks[nz] / out_deg[nz]
                contrib = np.repeat(w, out_deg)
                dsts, inv = np.unique(indices, return_inverse=True)
                partial = np.zeros(len(dsts))
                np.add.at(partial, inv, contrib)
                outs.append(pd.DataFrame({"dst": dsts, "partial": partial}))
                if dmass > 0:
                    outs.append(
                        pd.DataFrame({"dst": [-1], "partial": [dmass]})
                    )
            if not outs:
                return pd.DataFrame({"dst": [], "partial": []})
            return pd.concat(outs, ignore_index=True)

        partials = joined.groupBy("block_id").applyInPandas(
            scatter, scatter_schema
        )
        contribs = partials.groupBy("dst").agg(
            F.sum("partial").alias("contrib")
        )
        # Dangling mass enters the plan as a broadcast 1-row aggregate
        # crossed onto the state side of the cogroup — the whole
        # superstep stays ONE Spark job (the checkpoint
        # materialization), same pattern as pagerank.py's step.  A
        # driver-side collect here would add one extra job per
        # superstep — pure latency at 100 iterations.
        dang = contribs.agg(
            F.coalesce(
                F.sum(F.when(F.col("dst") == -1, F.col("contrib"))), F.lit(0.0)
            ).alias("_dmass")
        )

        real = contribs.where(F.col("dst") >= 0)
        if block_map is None:
            # ownership is a pure function of the id — no lookup table,
            # like the reference's DefaultHash (BVertex.tpp:6-13)
            gathered = real.select(
                F.pmod(F.col("dst"), F.lit(n_blocks)).cast("int").alias("block_id"),
                "dst",
                "contrib",
            )
        else:
            # data-driven ownership: one post-combine lookup per
            # superstep — broadcast under the gate, else a join where
            # only the O(distinct dst) contribs side shuffles
            from gminer_spark.graph.triangles import gated_broadcast

            gathered = real.join(
                gated_broadcast(block_map, n_map), on="dst"
            ).select(
                F.col("block").cast("int").alias("block_id"), "dst", "contrib"
            )

        def gather(key, state_pdf, contrib_pdf) -> pd.DataFrame:
            (block_id,) = key
            vids = np.asarray(state_pdf["vids"].iloc[0], dtype=np.int64)
            dmass = float(state_pdf["_dmass"].iloc[0])
            base = teleport + damping * dmass / n
            ranks = np.full(len(vids), base)
            if len(contrib_pdf):
                pos = np.searchsorted(vids, contrib_pdf["dst"].to_numpy(np.int64))
                ranks[pos] += damping * contrib_pdf["contrib"].to_numpy(np.float64)
            return pd.DataFrame(
                {
                    "block_id": [int(block_id)],
                    "vids": [vids.tolist()],
                    "ranks": [ranks.tolist()],
                }
            )

        new_state = (
            state.crossJoin(F.broadcast(dang))
            .groupBy("block_id")
            .cogroup(gathered.groupBy("block_id"))
            .applyInPandas(gather, state_schema)
        )
        new_state = new_state.localCheckpoint()

        if num_iter is None:
            delta = (
                state.select("block_id", F.col("ranks").alias("old"))
                .join(new_state, on="block_id")
                .select(
                    F.aggregate(
                        F.zip_with("ranks", "old", lambda a, b: F.abs(a - b)),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d")
                )
                .agg(F.sum("d"))
                .first()[0]
            )
            state = new_state
            if delta < tol:
                break
        else:
            state = new_state

    blocks.unpersist()
    if block_map is not None:
        block_map.unpersist()
    return state.select(
        F.explode(F.arrays_zip("vids", "ranks")).alias("z")
    ).select(F.col("z.vids").alias("id"), F.col("z.ranks").alias("rank"))
