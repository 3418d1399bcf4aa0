"""Connected components via hash-min label exchange.

The reference implements exactly this as ``subG_hashmin``
(/root/reference/partition/BPartitioner.tpp:91-165): every vertex
starts labeled with its own id, broadcasts its label, keeps the min of
incoming messages, votes to halt when unchanged; the min-combiner
(/root/reference/partition/BDGPartitioner.tpp:259-263) folds duplicate
messages pre-shuffle.

Spark mapping: messages = edges ⋈ state, the combiner is partial
aggregation inside ``groupBy(dst).min(label)``, vote-to-halt is the
``changed == 0`` driver-side test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.checkpoint import CheckpointStore
from gminer_spark.graph import tables
from gminer_spark.graph.superstep import SuperstepResult, run_supersteps


def connected_components(
    edges: DataFrame,
    max_iter: int = 200,
    store: CheckpointStore | None = None,
    resume: bool = True,
) -> SuperstepResult:
    """Hash-min CC over ``edges(src, dst)`` (treated as undirected).

    Returns state ``(id, component)`` where ``component`` is the
    minimum vertex id in the component — exact parity with the
    reference semantics and with a union-find oracle.
    """
    spark = edges.sparkSession
    # sizing count on a persisted input: expensive upstream lineage
    # materializes once, and symmetrize below reads the cached rows
    edges, n_in, we_persisted = tables.ensure_materialized(edges)
    n_shuffle = tables.sized_partitions(spark, n_in)
    sym = tables.symmetrize(edges).repartition(n_shuffle, "src").persist()
    edge_count = sym.count()
    if we_persisted:
        edges.unpersist()

    # state carries an `active` flag — the vote-to-halt mechanism
    # (/root/reference/partition/BVertex.tpp:56-66): only vertices whose
    # label changed last round broadcast this round, so message volume
    # tracks the shrinking frontier instead of |E| every superstep.
    # Correct for hash-min because label propagation is monotone.
    init = tables.vertices(sym).select(
        "id", F.col("id").alias("component"), F.lit(True).alias("active")
    )

    def step(state: DataFrame, k: int):
        frontier = state.where(F.col("active"))
        msgs = (
            sym.join(frontier, sym.src == frontier.id)
            .select("dst", "component")
            .groupBy("dst")
            .agg(F.min("component").alias("msg"))
        )
        new_state = (
            state.join(msgs, state.id == msgs.dst, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("msg"), F.col("component"))
                ).alias("component"),
                F.coalesce(F.col("msg") < F.col("component"), F.lit(False)).alias(
                    "active"
                ),
            )
        )
        new_state = new_state.localCheckpoint()
        changed = (
            new_state.agg(
                F.coalesce(F.sum(F.col("active").cast("long")), F.lit(0))
            ).first()[0]
        )
        metrics = {
            "edges_scanned": edge_count,
            "messages_shuffled": edge_count,
            "delta": float(changed),
            "changed": int(changed),
        }
        return new_state, metrics

    result = run_supersteps(
        init,
        step,
        lambda m: m["changed"] == 0,
        max_iter=max_iter,
        store=store,
        resume=resume,
    )
    result.state = result.state.select("id", "component")
    sym.unpersist()
    return result
