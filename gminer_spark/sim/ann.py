"""Similarity search over an embedding column (array<float>).

* :func:`cosine_topk` — exact brute-force baseline: broadcast the
  query set, JVM-side ``zip_with``/``aggregate`` dot products (no
  Python), window top-k.  Right answer at any scale where
  |queries| × |corpus| pairs are joinable.
* :func:`ann_lsh_topk` — the scale path: random-hyperplane LSH.
  Deterministic pseudo-planes derived from md5 (reproducible across
  runs/engines), signature = sign-bit string, candidates restricted
  to equal-bucket collisions (multi-probe via multiple tables), then
  exact re-rank.  Recall < 1 by construction; tested for recall ≥
  threshold vs the brute-force baseline, not for equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cos(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (na * nb)


def cosine_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 5
) -> DataFrame:
    """(query_id, neighbor_id, cos) — exact top-k by cosine.

    Tie-break: higher cosine first, then smaller neighbor_id
    (deterministic across parallelism).  Self-matches excluded.
    """
    q = embeddings.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    joined = (
        F.broadcast(q)
        .crossJoin(
            embeddings.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("nv"),
            )
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cos(F.col("qv"), F.col("nv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def _plane_matrix(dim: int, n_planes: int, table: int):
    """md5-derived ±1 hyperplanes — pure-function planes, no stored
    model, identical on every executor/run."""
    import hashlib

    import numpy as np

    m = np.empty((dim, n_planes))
    for p in range(n_planes):
        for d in range(dim):
            h = int(hashlib.md5(f"{table}:{p}:{d}".encode()).hexdigest()[:8], 16)
            m[d, p] = 1.0 if h & 1 else -1.0
    return m


def _lsh_signature_udf(dim: int, n_planes: int, table: int):
    """Vectorized sign-bit signature: one Arrow batch → one matmul.

    (An expression-tree formulation — dim × planes × tables nested
    column arithmetic — ships MB-scale task binaries; the closure
    captures only the small plane matrix.)
    """
    import numpy as np
    import pandas as pd

    planes = _plane_matrix(dim, n_planes, table)

    def _sig(emb):
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])
        bits = (mat @ planes) > 0
        return pd.Series(
            ["".join("1" if b else "0" for b in row) for row in bits]
        )

    # real annotation objects: the module's postponed annotations would
    # leave pyspark's hint parser with unresolvable strings here
    _sig.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    return F.pandas_udf("string")(_sig).asNondeterministic()


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    all_pairs_limit: int = 200_000,
    n_planes: int = 8,
    n_tables: int = 6,
) -> DataFrame:
    """(vec_a, vec_b, cos) pairs with cosine >= threshold — the
    embedding-space near-duplicate detector of the dedup family.

    Two plans behind one row-count gate:

    * n <= ``all_pairs_limit``: exact all-pairs theta join — the only
      recall-1 plan, affordable when n² pairs are joinable.
    * above the gate: random-hyperplane LSH bucket join (the scale
      path) — signature tables from :func:`_lsh_signature_udf`,
      candidates are equal-(table, sig) collisions only, then the
      exact cosine re-rank.  NEVER a cartesian product: the join key
      is the signature, so cost is bounded by bucket sizes.  Recall
      < 1 by construction (tested for recall ≥ bound in pytest, like
      ann_lsh_topk); raise ``n_tables`` to trade compute for recall.

    Cosine is computed JVM-side (zip_with fold in double) and rounded
    before thresholding for cross-engine determinism.
    """
    if embeddings.count() <= all_pairs_limit:
        a = embeddings.select(
            F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va")
        )
        b = embeddings.select(
            F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb")
        )
        return (
            a.join(b, a.vec_a < b.vec_b)
            .select(
                "vec_a",
                "vec_b",
                F.round(_cos(F.col("va"), F.col("vb")), 6).alias("cos"),
            )
            .where(F.col("cos") >= threshold)
        )
    return _near_dups_lsh(embeddings, threshold, n_planes, n_tables)


def _near_dups_lsh(
    embeddings: DataFrame, threshold: float, n_planes: int, n_tables: int
) -> DataFrame:
    """LSH candidate generation + exact re-rank for near-dup pairs."""
    dim = len(embeddings.select("embedding").first()[0])
    sigs = None
    for t in range(n_tables):
        sig_udf = _lsh_signature_udf(dim, n_planes, t)
        s = embeddings.select(
            "vec_id",
            F.lit(t).alias("table"),
            sig_udf(F.col("embedding")).alias("sig"),
        )
        sigs = s if sigs is None else sigs.unionByName(s)
    a = sigs.select(F.col("vec_id").alias("vec_a"), "table", "sig")
    b = sigs.select(F.col("vec_id").alias("vec_b"), "table", "sig")
    cand_ids = (
        a.join(b, on=["table", "sig"])  # bucket join — shuffle key = sig
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    ea = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va")
    )
    eb = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb")
    )
    return (
        cand_ids.join(ea, on="vec_a")
        .join(eb, on="vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(_cos(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def _ivf_assign_udf(centroids):
    """Vectorized nearest-centroid assignment (cosine): one Arrow batch
    → one matmul against the (small) normalized centroid matrix.
    Tie-break: lowest cell index (np.argmax keeps the first max)."""
    import numpy as np
    import pandas as pd

    cents = np.asarray(centroids, dtype=np.float64)

    def _assign(emb):
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ cents.T
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    _assign.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    return F.pandas_udf("int")(_assign).asNondeterministic()


def ivf_centroids(
    embeddings: DataFrame, n_cells: int = 32, kmeans_iters: int = 3
):
    """Deterministic coarse quantizer for IVF: Lloyd's k-means with
    md5-rank seeding (the ``n_cells`` vectors with the smallest
    ``h32(vec_id)`` — reproducible, no RNG), centroids L2-normalized
    and rounded to 1e-6 each round so float summation order cannot
    leak into assignments.  Returns an (n_cells, dim) numpy array —
    small enough to ship in a UDF closure (the "stored model" of a
    real IVF index, kept driver-side like the reference keeps its
    master-side aggregates)."""
    import numpy as np

    from gminer_spark.functions import h32

    seed_rows = (
        embeddings.withColumn("hr", h32(F.col("vec_id").cast("string")))
        .orderBy("hr", "vec_id")
        .limit(n_cells)
        .select("embedding")
        .collect()
    )
    cents = np.asarray([list(r["embedding"]) for r in seed_rows], np.float64)

    def _norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return np.round(m / n, 6)

    cents = _norm(cents)
    for _ in range(kmeans_iters):
        assign = _ivf_assign_udf(cents)
        sums = (
            embeddings.select(assign(F.col("embedding")).alias("cell"), "embedding")
            .select("cell", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.col("x").cast("double")).alias("s"),
                F.count("*").alias("c"),
            )
            .collect()  # n_cells × dim rows — tiny
        )
        new = cents.copy() * 0.0
        counts = np.zeros(len(cents))
        for r in sums:
            new[r["cell"], r["pos"]] = r["s"] / (r["c"] or 1)
            counts[r["cell"]] = r["c"]
        new[counts == 0] = cents[counts == 0]  # empty cell keeps centroid
        cents = _norm(new)
    return cents


def ann_ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 32,
    n_probe: int = 4,
    kmeans_iters: int = 3,
) -> DataFrame:
    """IVF approximate top-k: k-means cells as the inverted index, each
    query probes its ``n_probe`` nearest cells, exact cosine re-rank
    inside the probed lists.

    The scale shape of a real IVF search: corpus scan happens ONCE to
    build cell assignments (shuffle key = cell), each query touches
    n_probe/n_cells of the corpus, and the re-rank join is bounded by
    probed-list sizes — never a cartesian.  Recall < 1 by construction
    (raise n_probe); tested for recall ≥ bound vs cosine_topk."""
    import numpy as np
    import pandas as pd

    cents = ivf_centroids(embeddings, n_cells=n_cells, kmeans_iters=kmeans_iters)
    assign = _ivf_assign_udf(cents)
    inverted = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("nv"),
        assign(F.col("embedding")).alias("cell"),
    )

    n_probe = min(n_probe, len(cents))

    def _probe(emb):
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ np.asarray(cents).T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    _probe.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    probe_udf = F.pandas_udf("array<int>")(_probe).asNondeterministic()

    q = embeddings.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.explode(probe_udf(F.col("embedding"))).alias("cell"),
    )
    cand = (
        q.join(inverted, on="cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cos(F.col("qv"), F.col("nv")), 6).alias("cos"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: bucket-join on LSH signatures, exact re-rank."""
    dim = len(embeddings.select("embedding").first()[0])
    tables = None
    for t in range(n_tables):
        sig_udf = _lsh_signature_udf(dim, n_planes, t)
        sig = embeddings.select(
            "vec_id",
            "embedding",
            F.lit(t).alias("table"),
            sig_udf(F.col("embedding")).alias("sig"),
        )
        tables = sig if tables is None else tables.unionByName(sig)
    tables = tables.persist()
    q = tables.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "table",
        "sig",
    )
    cand = (
        q.join(tables, on=["table", "sig"])
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cos(F.col("qv"), F.col("embedding")), 6).alias("cos"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    out = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )
    return out
