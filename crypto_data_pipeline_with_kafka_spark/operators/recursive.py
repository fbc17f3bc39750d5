"""Recursive (order-dependent) indicators — the one family a Spark
window CANNOT express (SURVEY §2.10: "EMA ... is a recursive computation
inexpressible as a Spark window built-in → applyInPandas per key").

EMA_t = α·x_t + (1-α)·EMA_{t-1}, seeded with EMA_0 = x_0. Each key's
series must be walked in order, so this is the legitimate
``applyInPandas`` escape hatch: grouped Arrow batches, one pandas frame
per key, vectorized everywhere except the unavoidable recurrence.

At 100 TB: state is one row per key inside the group walk; groups
process in parallel across executors; the shuffle is the same
(key-partition) exchange the window indicators already pay.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame


def ema(
    df: DataFrame,
    alpha: float = 0.125,  # 2/(16+1) ≈ EMA-16, binary-exact fraction
    key_cols: Sequence[str] = ("user_id",),
    order_cols: Sequence[str] = ("ts", "event_id"),
    value_col: str = "value",
) -> DataFrame:
    """Per-key exponential moving average. ``alpha`` defaults to a
    binary-exact value so the recurrence is bit-reproducible.

    Returns the input columns (keys, order, value) plus ``ema``.
    Self-contained closure: executors never import this package.
    """
    kc, oc, vc, a = list(key_cols), list(order_cols), value_col, float(alpha)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*kc, *oc, vc).schema.fields
    ) + ", ema double"

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(oc, kind="mergesort").reset_index(drop=True)
        vals = pdf[vc].to_numpy()
        out = vals.copy().astype("float64")
        prev = None
        for i, x in enumerate(vals):
            prev = x if prev is None else a * x + (1.0 - a) * prev
            out[i] = prev
        pdf = pdf[kc + oc + [vc]].copy()
        pdf["ema"] = out
        return pdf

    return df.select(*kc, *oc, vc).groupBy(*kc).applyInPandas(walk, schema=out_schema)
