"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k for one query vector. The scan is
  embarrassingly parallel; top-k is TakeOrdered (no global sort).
- knn_join: exact top-k for a (small, broadcastable) set of query vectors —
  broadcast-nested-loop + per-query window top-k.
- random_hyperplane_buckets / lsh_topk: LSH scale path — sign-of-projection
  bit buckets (random hyperplanes from a seeded deterministic generator),
  so candidate generation is an equi-join on bucket id instead of a cross
  join. At 100 TB, brute force is O(n·q); LSH cuts the candidate set by
  ~2^bits with recall traded via multiple hash tables.

All vector math is zip_with/aggregate (JVM); no Python UDFs.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.vectors import cosine_similarity, dot


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = cosine_similarity(F.col(vec_col), q)
    return (
        embeddings.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def knn_join(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    max_query_rows: int = 10_000,
) -> DataFrame:
    """Exact k-NN for each query row (queries must be broadcast-sized).

    Scale guard: the plan is a broadcast-nested-loop — cost is
    O(|embeddings| * |queries|) and the query side is materialized on every
    executor. Beyond ``max_query_rows`` that silently becomes a cartesian
    blow-up, so the operator refuses and points at the LSH/IVF paths
    (lsh_topk, operators/ivf.py), which shuffle on bucket ids instead.
    The guard costs ONE scan of the query side: the capped slice is
    checkpointed, the (free) post-materialization count is checked, and
    the same materialized slice feeds the broadcast — the query plan is
    never executed a second time."""
    qcap = queries.limit(max_query_rows + 1).localCheckpoint()
    if qcap.count() > max_query_rows:
        raise ValueError(
            f"knn_join query side has >{max_query_rows} rows; a broadcast-"
            "nested-loop would cartesian at this size. Use the LSH bucket "
            "join (lsh_topk) or IVF index (operators/ivf.py), or raise "
            "max_query_rows explicitly if the cluster can broadcast it."
        )
    joined = embeddings.crossJoin(F.broadcast(qcap))
    cos = cosine_similarity(F.col(vec_col), F.col(query_vec))
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        joined.select(query_id, F.col(id_col), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _seeded_hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG + Box-Muller);
    no numpy dependency at plan-build time, stable across runs."""
    state = seed & 0x7FFFFFFF

    def nxt() -> float:
        nonlocal state
        state = (1103515245 * state + 12345) % (1 << 31)
        return state / float(1 << 31)

    planes = []
    for _ in range(bits):
        v = []
        while len(v) < dim:
            u1, u2 = max(nxt(), 1e-12), nxt()
            r = math.sqrt(-2.0 * math.log(u1))
            v.append(r * math.cos(2 * math.pi * u2))
            if len(v) < dim:
                v.append(r * math.sin(2 * math.pi * u2))
        planes.append(v[:dim])
    return planes


def random_hyperplane_buckets(
    embeddings: DataFrame,
    dim: int,
    bits: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append an LSH bucket id: sign bits of projections onto ``bits``
    seeded hyperplanes, packed into a long."""
    planes = _seeded_hyperplanes(dim, bits, seed)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(F.col(vec_col), p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return embeddings.withColumn("lsh_bucket", bucket.cast("long"))


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only the query's LSH bucket is scanned.

    Recall < 1 by construction; for production multiply hash tables or probe
    neighboring buckets. The point is the shape: candidate generation is a
    partition-prunable equi-filter, not a full scan."""
    planes = _seeded_hyperplanes(dim, bits, seed)
    qbucket = 0
    for i, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, plane)) >= 0:
            qbucket |= 1 << i
    bucketed = random_hyperplane_buckets(embeddings, dim, bits, seed, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.filter(F.col("lsh_bucket") == qbucket)
        .select(F.col(id_col), cosine_similarity(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def lsh_topk_multi(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    bits: int = 6,
    n_tables: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table LSH top-k — the standard recall lever single-bucket
    LSH lacks: L independent hash tables (each its own seeded planes), a
    row is a candidate iff it matches the query's bucket in ANY table
    (union-of-buckets). For a literal query vector this compiles to ONE
    scan with a disjunctive filter (no join, no shuffle; TakeOrdered for
    the top-k) — each table's bucket match keeps ~2^-bits of rows, so
    the candidate fraction is <= L/2^bits and recall rises as
    1-(1-p^bits)^L. With a query TABLE the same construction becomes an
    equi-join on (table_id, bucket), which is how the 100 TB shape runs.

    Plan shape: candidate filtering runs as ONE Arrow-batched GEMM per
    batch ((batch x dim) @ (dim x L*bits), then a per-table bucket
    compare in numpy) — the same discipline as the t80 signature stage
    in plans/vectorops.py. Expression-tree alternatives were measured
    and rejected: L*bits separate interpreted folds cost ~7 s/run in
    analysis, and a transform+exists() pipeline collapses into the
    filter so element_at re-evaluates the whole transform per access
    (~96x the flops, ~20 s/run). Sign-flip risk vs the Python-side
    query-bucket fold is the t80 margin argument (double reorder noise
    ~1e-14 against empirically O(1e-6)+ projection margins), and only
    candidate MEMBERSHIP depends on it, never emitted values. The exact
    cosine ranking of survivors stays JVM-side."""
    import numpy as np
    import pandas as pd

    flat_planes: list[list[float]] = []
    qbuckets: list[int] = []
    for t in range(n_tables):
        planes = _seeded_hyperplanes(dim, bits, seed + 1000 * t)
        qb = 0
        for i, plane in enumerate(planes):
            flat_planes.append(plane)
            if sum(a * b for a, b in zip(query_vec, plane)) >= 0:
                qb |= 1 << i
        qbuckets.append(qb)
    pm = np.asarray(flat_planes, dtype=np.float64)  # (L*bits) x dim
    qb_arr = np.asarray(qbuckets, dtype=np.int64)
    weights = np.asarray(
        [1 << i for i in range(bits)], dtype=np.int64
    )

    out_schema = f"{id_col} long, {vec_col} array<float>"

    def _candidates(batches):
        for pdf in batches:
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if len(x) == 0:
                continue
            b = ((x @ pm.T) >= 0).astype(np.int64)  # n x (L*bits)
            buckets = b.reshape(len(x), n_tables, bits) @ weights  # n x L
            keep = (buckets == qb_arr[None, :]).any(axis=1)
            if keep.any():
                yield pdf.loc[keep, [id_col, vec_col]]

    cand = embeddings.select(id_col, vec_col).mapInPandas(
        _candidates, out_schema
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            F.col(id_col), cosine_similarity(F.col(vec_col), q).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
