"""Custom stateful streaming operators (SURVEY §2.9 ST6): per-key state
checkpointed by the engine — the principled replacement for the
reference's in-memory producer dicts that vanish on restart
(``producer_prices.py:31``, ``producer_news.py:45``).

``streaming_ema`` carries each key's EMA across micro-batches with
``applyInPandasWithState``: recursive indicators (inexpressible as
windows, SURVEY §2.10) become incremental in streaming — each batch
walks only ITS rows, seeded from state, instead of recomputing history.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EMA_OUTPUT_SCHEMA = "user_id long, event_id long, ts timestamp, value double, ema double"
EMA_STATE_SCHEMA = "ema double"


def streaming_ema(events: DataFrame, alpha: float = 0.125) -> DataFrame:
    """Per-key streaming EMA. Rows within a batch are walked in
    (ts, event_id) order; the carry-over EMA lives in engine state, so
    across batches the recurrence equals a batch recompute over the full
    ordered history (asserted in tests). ``alpha`` should be
    binary-exact for reproducibility."""
    a = float(alpha)

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        prev = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort").reset_index(
                drop=True
            )
            out = []
            for x in pdf["value"]:
                prev = x if prev is None else a * x + (1.0 - a) * prev
                out.append(prev)
            pdf = pdf[["user_id", "event_id", "ts", "value"]].copy()
            pdf["ema"] = out
            yield pdf
        state.update((prev,))

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            EMA_OUTPUT_SCHEMA,
            EMA_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
