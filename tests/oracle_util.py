"""Local replica of the driver's Spark-vs-DuckDB comparison: row count,
column names, and order-insensitive value equality."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        else:
            df[c] = s.astype(object).where(s.notna(), None).map(
                lambda v: str(v) if v is not None else None
            )
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "") -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    errs = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        return [f"{name}: columns {sorted(sp.columns)} != {sorted(oracle_df.columns)}"]
    if len(sp) != len(oracle_df):
        errs.append(f"{name}: rowcount {len(sp)} != {len(oracle_df)}")
    a, b = _norm(sp), _norm(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if a[c].dtype.kind == "f":
                ok = np.array_equal(av, bv, equal_nan=True) or bool(
                    np.all(
                        np.isclose(av, bv, rtol=1e-9, atol=1e-9, equal_nan=True)
                        | (np.isinf(av) & np.isinf(bv))
                    )
                )
            else:
                ok = list(av) == list(bv)
            if not ok:
                bad = [
                    (i, av[i], bv[i])
                    for i in range(len(av))
                    if not _eq(av[i], bv[i])
                ][:3]
                errs.append(f"{name}: column {c} differs, first: {bad}")
    return errs


def _eq(x, y):
    if x is None or y is None:
        return x is y
    if isinstance(x, float) and isinstance(y, float):
        if math.isnan(x) and math.isnan(y):
            return True
        if math.isinf(x) or math.isinf(y):
            return x == y
        return math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
    return x == y
