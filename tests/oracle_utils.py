"""Order-insensitive DataFrame comparison mirroring the driver's oracle check:
row count + column names + value multiset (floats rounded)."""

from __future__ import annotations

import math

import pandas as pd


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def normalize(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort()
    return out


def assert_frames_match(spark_df, duck_rel, name: str) -> None:
    spdf = spark_df.toPandas()
    ddf = duck_rel.df()
    assert sorted(spdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} oracle={sorted(ddf.columns)}"
    )
    assert len(spdf) == len(ddf), f"{name}: rowcount spark={len(spdf)} oracle={len(ddf)}"
    a, b = normalize(spdf), normalize(ddf)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:5]
        diff_b = [r for r in b if r not in set(a)][:5]
        raise AssertionError(
            f"{name}: value mismatch; spark-only={diff_a} oracle-only={diff_b}"
        )
