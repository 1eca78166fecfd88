"""Distributed dense linear algebra over embedding columns.

The core pattern is the GRAM PARTIAL: each partition reduces its vectors
to one d x d outer-product accumulator (X^T X), a d-vector of column
sums, and a row count — a few KiB regardless of how many rows the
partition holds — and only those partials are shuffled. This is the
canonical building block for distributed covariance / PCA / linear
regression normal equations: one pass, one tiny shuffle, BLAS-rate math
inside Arrow batches.

Emitted long-form as (i, j, v) rows so the final combine is a plain
groupBy sum and the result is a first-class DataFrame:
- (i, j, sum of x_i * x_j) for the upper triangle i <= j,
- (i, -1, sum of x_i) for the column sums,
- (-1, -1, row count).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_PARTIAL_SCHEMA = "i int, j int, v double"


def gram_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-partition X^T X / column-sum / count partials, long form.

    One Arrow round-trip per partition; the shuffle carries
    d*(d+1)/2 + d + 1 rows per partition, independent of row count.
    """

    def part(pdfs: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        gram = np.zeros((dim, dim))
        sums = np.zeros(dim)
        n = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            gram += x.T @ x
            sums += x.sum(axis=0)
            n += len(x)
        if n == 0:
            return
        iu, ju = np.triu_indices(dim)
        yield pd.DataFrame(
            {
                "i": np.concatenate(
                    [iu, np.arange(dim), [-1]]
                ).astype("int32"),
                "j": np.concatenate(
                    [ju, np.full(dim, -1), [-1]]
                ).astype("int32"),
                "v": np.concatenate([gram[iu, ju], sums, [float(n)]]),
            }
        )

    return df.select(vec_col).mapInPandas(part, schema=_PARTIAL_SCHEMA)


def covariance_long(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Population covariance matrix as (i, j, cov) rows for i <= j.

    cov(i, j) = S_ij/n - (S_i/n)(S_j/n) from the combined gram partials.
    The combine is one groupBy over <= partitions * (d^2/2 + d + 1) rows;
    the per-dimension sums and the count are broadcast back onto the
    2,080 pair rows (d = 64), so no stage ever touches per-row vector
    data after the partial pass.
    """
    agg = (
        gram_partials(df, vec_col, dim)
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )
    n_row = agg.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("v").alias("n")
    )
    col_sums = agg.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("k"), F.col("v").alias("s")
    )
    pair = agg.filter(F.col("j") >= 0)
    si = col_sums.select(F.col("k").alias("i"), F.col("s").alias("s_i"))
    sj = col_sums.select(F.col("k").alias("j"), F.col("s").alias("s_j"))
    return (
        pair.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n_row))
        .select(
            "i",
            "j",
            (
                F.col("v") / F.col("n")
                - (F.col("s_i") / F.col("n")) * (F.col("s_j") / F.col("n"))
            ).alias("cov"),
        )
    )
