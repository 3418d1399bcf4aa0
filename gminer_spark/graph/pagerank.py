"""PageRank on the superstep framework.

Not implemented in the reference (its README positions GMiner against
PageRank-style systems, /root/reference/README.md:5) — semantics are
fixed by BASELINE.json: damping 0.85, dangling-mass redistribution,
per-vertex allclose 1e-6 at convergence.

Each superstep is one shuffle-bounded plan:

    contribs  = edges ⋈ state(on src) → groupBy(dst).sum(rank/out_deg)
    dangling  = Σ rank over out_deg == 0            (driver-side agg)
    new_rank  = (1-d)/N + d * (contribs + dangling/N)

Spark's partial aggregation is the message combiner
(/root/reference/util/vecs.tpp:79-107 analog); AQE skew-join plus the
optional salted two-stage aggregation (gminer_spark.graph.salt)
handle hub-vertex skew in the contribution shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gminer_spark.checkpoint import CheckpointStore
from gminer_spark.graph import tables
from gminer_spark.graph.superstep import SuperstepResult, run_supersteps


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    num_iter: int | None = None,
    store: CheckpointStore | None = None,
    resume: bool = True,
    weight_col: str | None = None,
    reset: DataFrame | None = None,
    init_state: DataFrame | None = None,
) -> SuperstepResult:
    """PageRank over a directed ``edges(src, dst)`` DataFrame.

    Returns state ``(id, rank)``.  ``num_iter`` forces an exact
    iteration count (oracle parity mode); otherwise the loop stops at
    L1 delta < ``tol``.

    ``weight_col`` names an edge-weight column: contributions become
    ``rank * w / Σ_out w`` (out-STRENGTH replaces out-degree; weights
    must be positive).  ``reset`` is a 1-column ``(id)`` DataFrame of
    teleport seeds — personalized PageRank: both the teleport term and
    the dangling-mass redistribution land uniformly on the seed set
    instead of all vertices, and the walk starts from the seeds.  The
    plan shape is identical in every variant: one rank-shuffle join
    per superstep, dangling as a broadcast 1-row aggregate.

    ``init_state`` is a ``(id, rank)`` DataFrame to WARM-START from
    (e.g. the previous run's ranks after an edge batch arrived).  The
    update is an affine L1-contraction with factor = damping, so it
    converges to the same unique fixpoint from any start — warm starts
    change only the superstep count, not the answer.  Vertices absent
    from ``init_state`` start at the cold-start value.
    """
    spark = edges.sparkSession
    # Static tables, computed once and reused across all supersteps.
    # At cluster scale these are hash-co-partitioned with the state on
    # the join key (src) so each iteration's join shuffles only ranks.
    # The sizing count runs on a PERSISTED input so expensive upstream
    # lineage (e.g. the co-purchase self-join) materializes exactly once.
    edges_in, n_in, we_persisted = tables.ensure_materialized(edges)
    n_shuffle = tables.sized_partitions(spark, n_in)
    if weight_col is not None:
        edges = edges_in.select(
            "src", "dst", F.col(weight_col).cast("double").alias("w")
        )
        strength_agg = F.sum("w").alias("out_deg")
    else:
        edges = edges_in.select("src", "dst")
        strength_agg = F.count("*").cast("long").alias("out_deg")
    edges = edges.repartition(n_shuffle, "src").persist()
    verts = tables.vertices(edges)
    out_deg = (
        verts.join(
            edges.groupBy(F.col("src").alias("id")).agg(strength_agg),
            on="id",
            how="left",
        )
        .select("id", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        .repartition(n_shuffle, "id")
        .persist()
    )
    n = out_deg.count()  # also materializes the persists
    edge_count = edges.count()
    if we_persisted:
        edges_in.unpersist()  # repartitioned copy is materialized now
    if n == 0:
        empty = spark.createDataFrame([], "id long, rank double")
        return SuperstepResult(empty, 0, 0, True, [])

    if reset is not None:
        # Seed set is tiny relative to |V| (that's the point of PPR) —
        # broadcast the membership probe; reset mass 1/|S| per seed.
        # materialize the (tiny) seed set once: its lineage may be an
        # expensive derive (vertices() over the edge table) that would
        # otherwise run again for the broadcast below
        seeds = (
            reset.select(F.col("id").cast("long").alias("id"))
            .distinct()
            .localCheckpoint()
        )
        n_seeds = seeds.count()
        if n_seeds == 0:
            raise ValueError("personalized PageRank needs a non-empty seed set")
        base_deg = out_deg
        out_deg = (
            out_deg.join(
                F.broadcast(seeds.withColumn("_s", F.lit(True))), on="id", how="left"
            )
            .select(
                "id",
                "out_deg",
                F.when(F.col("_s"), F.lit(1.0 / n_seeds))
                .otherwise(F.lit(0.0))
                .alias("reset"),
            )
            .persist()
        )
        out_deg.count()
        base_deg.unpersist()  # reset-annotated copy is materialized now
        cold = F.col("reset")
        carry_cols = ["out_deg", "reset"]
    else:
        cold = F.lit(1.0 / n)
        carry_cols = ["out_deg"]
    if init_state is not None:
        init = (
            out_deg.join(
                init_state.select("id", F.col("rank").alias("_warm")), on="id", how="left"
            )
            .select("id", F.coalesce("_warm", cold).alias("rank"), *carry_cols)
        )
    else:
        init = out_deg.select("id", cold.alias("rank"), *carry_cols)

    teleport = (1.0 - damping) / n
    contrib_expr = (
        (F.col("rank") * F.col("w") / F.col("out_deg"))
        if weight_col is not None
        else (F.col("rank") / F.col("out_deg"))
    )

    def step(state: DataFrame, k: int):
        # Dangling mass enters the plan as a broadcast 1-row aggregate —
        # the whole superstep is ONE Spark job (the checkpoint
        # materialization), no separate driver-side collect barrier.
        dangling = state.where(F.col("out_deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling")
        )
        contribs = (
            edges.join(state, edges.src == state.id)
            .select(F.col("dst"), contrib_expr.alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("contrib"))
        )
        if reset is not None:
            rank_expr = F.lit(1.0 - damping) * F.col("reset") + F.lit(damping) * (
                F.coalesce(F.col("contrib"), F.lit(0.0))
                + F.col("_dangling") * F.col("reset")
            )
            carry = ["out_deg", "reset"]
        else:
            rank_expr = F.lit(teleport) + F.lit(damping) * (
                F.coalesce(F.col("contrib"), F.lit(0.0))
                + F.col("_dangling") / F.lit(float(n))
            )
            carry = ["out_deg"]
        new_state = (
            out_deg.join(contribs, out_deg.id == contribs.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select("id", rank_expr.alias("rank"), *carry)
        )
        metrics = {
            "edges_scanned": edge_count,
            "messages_shuffled": edge_count,
        }
        if num_iter is None:
            # ONE action per superstep: lazy barrier (the round plan
            # references state twice — dangling + contribs) is
            # materialized by the delta aggregate, which is the
            # convergence signal; _checkpointed stops the framework
            # from re-encoding the leaf.
            new_state = tables.plan_barrier(new_state, eager=False)
            delta = (
                new_state.select("id", "rank")
                .join(state.select("id", F.col("rank").alias("old")), on="id")
                .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
                .first()[0]
            )
            metrics["delta"] = float(delta)
            metrics["_checkpointed"] = True
        return new_state, metrics

    # Fixed-iteration mode stays the per-superstep loop: one eager
    # localCheckpoint per superstep is already the round's single job,
    # with NO extra encode (localCheckpoint persists the computed
    # InternalRows directly).  A fully-fused variant — all supersteps
    # composed lazily behind plan_barriers, one action total — was
    # built and A/B'd in r6 and measured ~13% SLOWER: plan_barrier's
    # Row<->InternalRow re-encode per superstep is O(|V|) added work
    # that outweighs the saved driver round trips, locally and worse
    # at scale.  (Tol mode DOES use one lazy barrier per superstep:
    # there it replaces 3 jobs — checkpoint, delta agg, framework
    # re-checkpoint — with 1, a real cut.)
    if num_iter is not None:
        converged = lambda m: m["superstep"] >= num_iter  # noqa: E731
        max_iter = num_iter
    else:
        converged = lambda m: m["delta"] < tol  # noqa: E731

    result = run_supersteps(
        init, step, converged, max_iter=max_iter, store=store, resume=resume
    )
    result.state = result.state.select("id", "rank")
    edges.unpersist()
    out_deg.unpersist()
    return result


def ppr_batch(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    num_iter: int = 10,
) -> DataFrame:
    """(s, id, rank) — one personalized PageRank vector PER seed, all
    seeds propagated simultaneously with state keyed ``(s, id)`` (the
    recommendation primitive: rank of id in seed s's walk).

    Differs from ``pagerank(reset=...)``, which spreads ONE teleport
    vector across the whole seed set.  State rows exist only for
    reached pairs (ranks are 0 elsewhere), so cost scales with
    Σ|reach(s)| rather than |S|·|V|; each superstep is the standard
    edges ⋈ state shuffle plus a broadcast |S|-row dangling table —
    the batched-task pattern (many tasks, one plan) the mining
    kernels use.
    """
    spark = edges.sparkSession
    edges_in, n_in, we_persisted = tables.ensure_materialized(edges)
    n_shuffle = tables.sized_partitions(spark, n_in)
    e = edges_in.select("src", "dst").repartition(n_shuffle, "src").persist()
    deg = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").cast("long").alias("out_deg"))
        .persist()
    )
    deg.count()
    if we_persisted:
        edges_in.unpersist()
    base = (
        seeds.select(F.col("id").cast("long").alias("s"))
        .distinct()
        .select("s", F.col("s").alias("id"))
        .localCheckpoint()
    )
    state = base.select("s", "id", F.lit(1.0).alias("rank"))
    # per-iteration eager localCheckpoint: already one job per round
    # with no re-encode (see pagerank's fixed-iteration note — the
    # fused plan_barrier variant measured slower in r6).
    for _ in range(num_iter):
        ranked = state.join(deg, on="id", how="left").select(
            "s", "id", "rank", F.coalesce("out_deg", F.lit(0)).alias("out_deg")
        )
        dang = (
            ranked.where(F.col("out_deg") == 0)
            .groupBy("s")
            .agg(F.sum("rank").alias("_dang"))
        )
        contribs = (
            e.join(ranked, e.src == ranked.id)
            .select("s", F.col("dst").alias("id"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("s", "id")
            .agg(F.sum("c").alias("contrib"))
        )
        state = (
            contribs.join(base.withColumn("_seed", F.lit(True)), on=["s", "id"], how="full")
            .join(F.broadcast(dang), on="s", how="left")
            .select(
                "s",
                "id",
                (
                    F.lit(1.0 - damping) * F.coalesce(F.col("_seed").cast("double"), F.lit(0.0))
                    + F.lit(damping)
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.coalesce("_dang", F.lit(0.0))
                        * F.coalesce(F.col("_seed").cast("double"), F.lit(0.0))
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    deg.unpersist()
    return state


def ppr_batch_oracle_sql(
    edges_cte: str, seed_pred: str, iters: int, damping: float = 0.85
) -> str:
    """Unrolled per-seed PPR: state keyed (s, id), reached pairs only
    (identical row-set growth to the engine — reach is monotone)."""
    ctes = [
        f"{edges_cte.strip()}",
        """sym AS MATERIALIZED (
    SELECT src, dst FROM edges
    UNION SELECT dst AS src, src AS dst FROM edges)""",
        """verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM sym)""",
        """deg AS MATERIALIZED (
    SELECT v.id, COALESCE(o.c, 0) AS out_deg
    FROM verts v LEFT JOIN (
        SELECT src, COUNT(*) AS c FROM edges GROUP BY src) o
    ON v.id = o.src)""",
        f"""seeds AS MATERIALIZED (
    SELECT id AS s, id FROM verts WHERE {seed_pred})""",
        "p0 AS MATERIALIZED (SELECT s, id, 1.0 AS rank FROM seeds)",
    ]
    for k in range(1, iters + 1):
        p = f"p{k - 1}"
        ctes.append(
            f"""p{k} AS MATERIALIZED (
    SELECT COALESCE(c.s, b.s) AS s, COALESCE(c.id, b.id) AS id,
           (1.0 - {damping}) * (CASE WHEN b.s IS NOT NULL THEN 1.0 ELSE 0.0 END)
           + {damping} * (
               COALESCE(c.contrib, 0.0)
               + COALESCE(dg.dang, 0.0)
                 * (CASE WHEN b.s IS NOT NULL THEN 1.0 ELSE 0.0 END)
           ) AS rank
    FROM (
        SELECT r.s, e.dst AS id, SUM(r.rank / d.out_deg) AS contrib
        FROM edges e
        JOIN {p} r ON e.src = r.id
        JOIN deg d ON d.id = r.id
        GROUP BY r.s, e.dst) c
    FULL OUTER JOIN seeds b ON c.s = b.s AND c.id = b.id
    LEFT JOIN (
        SELECT r.s, SUM(r.rank) AS dang
        FROM {p} r JOIN deg d ON d.id = r.id
        WHERE d.out_deg = 0 GROUP BY r.s) dg
    ON COALESCE(c.s, b.s) = dg.s)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT s, id, CAST(ROUND(rank * 1e6) AS BIGINT) AS rank_micro
FROM p{iters}"""
    )


class PageRankMaintainer:
    """Streaming PageRank: feed edge batches (e.g. from
    ``foreachBatch``), read ``ranks`` between updates.

    Each update unions the batch into the accumulated edge table
    (dedup'd, materialized via ``localCheckpoint`` so lineage never
    chains across batches) and re-converges WARM-STARTED from the
    previous ranks — the same fixpoint a cold run reaches (the update
    is an L1 contraction), usually in far fewer supersteps when the
    batch perturbs the graph mildly."""

    def __init__(self, damping: float = 0.85, tol: float = 1e-6) -> None:
        self.damping = damping
        self.tol = tol
        self.edges: DataFrame | None = None
        self.ranks: DataFrame | None = None
        self.last_supersteps = 0

    def update(self, batch_edges: DataFrame) -> DataFrame:
        batch = batch_edges.select("src", "dst")
        if self.edges is None:
            self.edges = batch.distinct().localCheckpoint()
        else:
            self.edges = (
                self.edges.unionByName(batch).distinct().localCheckpoint()
            )
        res = pagerank(
            self.edges,
            damping=self.damping,
            tol=self.tol,
            init_state=self.ranks,
        )
        self.ranks = res.state.localCheckpoint()
        self.last_supersteps = res.supersteps_run
        return self.ranks
