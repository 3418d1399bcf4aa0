"""Synchronous label propagation (LPA) with deterministic tie-break.

The structural ancestor in the reference is the Voronoi color-spread
superstep (/root/reference/partition/BDGPartitioner.tpp:279-307):
adopt a neighbor's color, rebroadcast.  Classic sync LPA replaces
"first message wins" with "most frequent neighbor label"; for exact
cross-parallelism parity the tie-break is fixed: highest count first,
then smallest label (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gminer_spark.checkpoint import CheckpointStore
from gminer_spark.graph import tables
from gminer_spark.graph.superstep import SuperstepResult, run_supersteps


def label_propagation(
    edges: DataFrame,
    num_iter: int = 5,
    until_stable: bool = False,
    max_iter: int = 50,
    store: CheckpointStore | None = None,
    resume: bool = True,
    weight_col: str | None = None,
) -> SuperstepResult:
    """Sync LPA over ``edges(src, dst)`` (treated as undirected).

    Returns state ``(id, label)``.  Default is a fixed iteration count
    (sync LPA can oscillate on bipartite structures, so fixed-round is
    the reproducible contract; ``until_stable`` stops early when no
    label changes).

    ``weight_col`` names a non-negative INTEGER edge weight: each
    neighbor's vote counts w times (tie-break stays total: weight sum
    desc, then label asc — integer sums keep the mode deterministic
    across engines and partitionings).
    """
    spark = edges.sparkSession
    # sizing count on a persisted input: expensive upstream lineage
    # materializes once, and symmetrize below reads the cached rows
    edges, n_in, we_persisted = tables.ensure_materialized(edges)
    n_shuffle = tables.sized_partitions(spark, n_in)
    if weight_col is not None:
        fwd = edges.select("src", "dst", F.col(weight_col).cast("long").alias("w"))
        rev = fwd.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
        sym = (
            fwd.unionByName(rev)
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .repartition(n_shuffle, "src")
            .persist()
        )
    else:
        sym = tables.symmetrize(edges).repartition(n_shuffle, "src").persist()
    edge_count = sym.count()
    if we_persisted:
        edges.unpersist()

    init = tables.vertices(sym).select("id", F.col("id").alias("label"))

    def step(state: DataFrame, k: int):
        # groupBy(dst, label).count is the map-side-combined message
        # histogram; the window picks the deterministic mode.
        vote = F.sum("w") if weight_col is not None else F.count("*")
        counts = (
            sym.join(state, sym.src == state.id)
            .groupBy("dst", "label")
            .agg(vote.cast("long").alias("cnt"))
        )
        w = Window.partitionBy("dst").orderBy(
            F.col("cnt").desc(), F.col("label").asc()
        )
        mode = (
            counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("dst", F.col("label").alias("new_label"))
        )
        new_state = (
            state.join(mode, state.id == mode.dst, "left")
            .select(
                "id",
                F.coalesce("new_label", "label").alias("label"),
                (F.col("new_label") != F.col("label")).alias("_changed"),
            )
            # materialize ONCE: the changed-agg below and the
            # framework's commit both read the result; without this the
            # join+window superstep runs twice (cc.py:71 pattern)
            .localCheckpoint()
        )
        changed = new_state.agg(
            F.coalesce(F.sum(F.col("_changed").cast("long")), F.lit(0))
        ).first()[0]
        metrics = {
            "edges_scanned": edge_count,
            "messages_shuffled": edge_count,
            "delta": float(changed),
            "changed": int(changed),
        }
        return new_state.drop("_changed"), metrics

    if until_stable:
        converged = lambda m: m["changed"] == 0  # noqa: E731
    else:
        converged = lambda m: m["superstep"] >= num_iter  # noqa: E731
        max_iter = num_iter

    result = run_supersteps(
        init, step, converged, max_iter=max_iter, store=store, resume=resume
    )
    sym.unpersist()
    return result
