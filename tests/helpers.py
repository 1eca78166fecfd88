"""Test comparison helpers: order-insensitive frame equality with float
rounding (cross-engine double sums differ in the last ulp)."""

from __future__ import annotations

import pandas as pd


def normalize(df: pd.DataFrame, float_dp: int = 6) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.dt.strftime("%Y-%m-%d %H:%M:%S")
        elif pd.api.types.is_float_dtype(col):
            df[c] = col.round(float_dp).map(
                lambda v: "null" if pd.isna(v) else f"{v:.{float_dp}f}"
            )
        elif pd.api.types.is_bool_dtype(col) or str(col.dtype) == "boolean":
            df[c] = col.map(lambda v: "null" if pd.isna(v) else str(bool(v)))
        else:
            import datetime

            def fmt(v):
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    return "null"
                # Spark DATE arrives as datetime.date objects; DuckDB dates
                # arrive as datetime64 — normalize both to midnight strings
                if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
                    return f"{v} 00:00:00"
                return str(v)

            df[c] = col.map(fmt)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_frames_match(spark_df, duck_df: pd.DataFrame, float_dp: int = 6, context: str = ""):
    sdf = spark_df.toPandas() if hasattr(spark_df, "toPandas") else spark_df
    a, b = normalize(sdf, float_dp), normalize(duck_df, float_dp)
    assert list(a.columns) == list(b.columns), f"{context}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{context}: rowcount {len(a)} != {len(b)}"
    if not a.equals(b):
        diff = (a != b).any(axis=1)
        i = diff.idxmax()
        raise AssertionError(
            f"{context}: first mismatch row {i}:\nspark={a.iloc[i].to_dict()}\nduck ={b.iloc[i].to_dict()}"
        )
