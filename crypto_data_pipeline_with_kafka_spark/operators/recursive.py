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


def recursive_indicators(
    df: DataFrame,
    alpha: float = 0.125,
    period: int = 14,
    key_cols: Sequence[str] = ("user_id",),
    order_cols: Sequence[str] = ("ts", "event_id"),
    value_col: str = "value",
) -> DataFrame:
    """EMA **and Wilder-smoothed RSI** in ONE per-key ordered walk — the
    industry-standard RSI variant the reference does NOT implement (its
    simple-average RSI, ``spark_job_1.py:32-39``, is pinned by
    ``compute_indicators`` W3; this is the §2.10 extension exposing the
    recursive variant alongside it). Wilder's recurrence after the
    ``period``-diff warm-up seed (simple mean of the first ``period``
    gains/losses):

        avg_gain_t = (avg_gain_{t-1}·(period-1) + gain_t) / period
        rsi = 100 - 100/(1 + avg_gain/avg_loss);  avg_loss = 0 → 100

    Rows before the seed completes (rn ≤ period) have NULL rsi; the
    first ``rsi_wilder`` lands at row period+1. Every float op is
    written in the exact order the recursive-CTE oracle performs it, so
    the applyInPandas walk is value-exact against SQL, like ``ema``.

    Same scale shape as ``ema``: one key-partition exchange, O(1) state
    per key inside the walk, groups parallel across executors."""
    kc, oc, vc = list(key_cols), list(order_cols), value_col
    a, p = float(alpha), int(period)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*kc, *oc, vc).schema.fields
    ) + ", ema double, rsi_wilder double"

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(oc, kind="mergesort").reset_index(drop=True)
        vals = pdf[vc].to_numpy()
        emas = [0.0] * len(vals)
        rsis: list[float | None] = [None] * len(vals)
        ema_prev = sg = sl = 0.0
        ag = al = None
        for i, x in enumerate(vals):
            if i == 0:
                ema_prev = x
            else:
                ema_prev = a * x + (1.0 - a) * ema_prev
                d = x - vals[i - 1]
                g = d if d > 0 else 0.0
                ls = -d if d < 0 else 0.0
                rn = i + 1  # 1-based row number; diffs exist from rn=2
                if rn <= p:  # accumulating the first (period-1) diffs
                    sg += g
                    sl += ls
                elif rn == p + 1:  # seed: simple mean of first `p` diffs
                    sg += g
                    sl += ls
                    ag = sg / float(p)
                    al = sl / float(p)
                else:  # Wilder recurrence
                    ag = (ag * float(p - 1) + g) / float(p)
                    al = (al * float(p - 1) + ls) / float(p)
            emas[i] = ema_prev
            if ag is not None:
                rsis[i] = (
                    100.0 if al == 0.0 else 100.0 - 100.0 / (1.0 + ag / al)
                )
        out = pdf[kc + oc + [vc]].copy()
        out["ema"] = emas
        out["rsi_wilder"] = pd.array(rsis, dtype="Float64")  # NULL, not NaN
        return out

    return (
        df.select(*kc, *oc, vc).groupBy(*kc).applyInPandas(walk, schema=out_schema)
    )
