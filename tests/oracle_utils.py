"""Local mirror of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL over the same parquet tables, compare row count,
column names, and (order-insensitively) values."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from crypto_data_pipeline_with_kafka_spark.catalog import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("int64")
        elif s.dtype == object:
            pdf[c] = s.map(
                lambda v: tuple(np.asarray(v).tolist()) if isinstance(v, (list, np.ndarray)) else v
            )
    key = pdf.columns.tolist()
    return pdf.sort_values(key, na_position="first").reset_index(drop=True)


def compare(spark_df, sql: str, sf_dir: str, float_tol: float = 0.0) -> None:
    """Default float_tol=0.0: engine queries are written so float results
    are BITWISE identical across Spark and DuckDB (exact decimal sums cast
    to double; identical IEEE expression trees). Pass a tolerance only for
    inherently inexact ops."""
    got = _normalize(spark_df.toPandas())
    want = _normalize(run_oracle(sql, sf_dir))
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"columns: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g):
            both_nan = g.isna() & w.isna()
            # rtol=0: queries are engineered for BITWISE equality; any
            # tolerance here would mask decimal→double cast divergence
            close = np.isclose(g.fillna(0), w.fillna(0), atol=float_tol, rtol=0.0)
            ok = both_nan | (close & (g.isna() == w.isna()))
            if not ok.all():
                bad = (~ok).idxmax()
                raise AssertionError(
                    f"col {c!r} mismatch at row {bad}: spark={g[bad]} oracle={w[bad]}"
                )
        else:
            eq = (g == w) | (g.isna() & w.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                raise AssertionError(
                    f"col {c!r} mismatch at row {bad}: spark={g[bad]!r} oracle={w[bad]!r}"
                )


def hash_frame(pdf: pd.DataFrame) -> int:
    """Order-insensitive value hash (roughly what the driver records)."""
    norm = _normalize(pdf)
    total = 0
    for row in norm.itertuples(index=False):
        h = 0
        for v in row:
            if isinstance(v, float) and math.isnan(v):
                v = None
            h = hash((h, str(v)))
        total ^= h
    return total
