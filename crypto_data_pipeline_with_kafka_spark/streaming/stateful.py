"""Custom stateful streaming operators (SURVEY §2.9 ST6): per-key state
checkpointed by the engine — the principled replacement for the
reference's in-memory producer dicts that vanish on restart
(``producer_prices.py:31``, ``producer_news.py:45``).

``streaming_recursive_indicators`` carries each key's recursive
indicator state across micro-batches with ``applyInPandasWithState``:
recursive indicators (inexpressible as windows, SURVEY §2.10) become
incremental in streaming — each batch walks only ITS rows, seeded from
state, instead of recomputing history. The carried state is the FULL
recurrence tuple (EMA + Wilder RSI warm-up sums and averages + the
previous value for cross-batch diffs), so the streamed output is
bitwise-equal to the batch ``recursive_indicators`` walk over the same
ordered history (asserted in tests and by the shared recursive-CTE
oracle)."""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RECURSIVE_OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, value double, "
    "ema double, rsi_wilder double"
)
# ema + prev value (cross-batch diff) + row count (warm-up position) +
# warm-up gain/loss sums + Wilder running averages (NULL until seeded)
RECURSIVE_STATE_SCHEMA = (
    "ema double, prev_val double, n long, sg double, sl double, "
    "ag double, al double"
)



# (ema, prev_val, n, sg, sl, ag, al) — the full recurrence tuple
_INIT_REC_STATE = (None, None, 0, 0.0, 0.0, None, None)


def _recursive_chunk_walk(state, pdf, a: float, p: int):
    """One sorted chunk of a key's rows through the EMA + Wilder-RSI
    recurrence: takes the state tuple, returns (new_state, output pdf).
    THE single implementation both state APIs wrap
    (``streaming_recursive_indicators`` via applyInPandasWithState and
    the ``transformWithStateInPandas`` twin) — bitwise
    interchangeability between them is structural, not two hand-synced
    copies of the walk."""
    ema, prev_val, n, sg, sl, ag, al = state
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort").reset_index(
        drop=True
    )
    emas = []
    rsis: list[float | None] = []
    for x in pdf["value"]:
        n += 1
        if n == 1:
            ema = x
        else:
            ema = a * x + (1.0 - a) * ema
            d = x - prev_val
            g = d if d > 0 else 0.0
            ls = -d if d < 0 else 0.0
            if n <= p:
                sg += g
                sl += ls
            elif n == p + 1:
                sg += g
                sl += ls
                ag = sg / float(p)
                al = sl / float(p)
            else:
                ag = (ag * float(p - 1) + g) / float(p)
                al = (al * float(p - 1) + ls) / float(p)
        prev_val = x
        emas.append(ema)
        rsis.append(
            None
            if ag is None
            else (100.0 if al == 0.0 else 100.0 - 100.0 / (1.0 + ag / al))
        )
    out = pdf[["user_id", "event_id", "ts", "value"]].copy()
    out["ema"] = emas
    out["rsi_wilder"] = pd.array(rsis, dtype="Float64")  # NULL, not NaN
    return (ema, prev_val, n, sg, sl, ag, al), out


def streaming_recursive_indicators(
    events: DataFrame, alpha: float = 0.125, period: int = 14
) -> DataFrame:
    """Per-key streaming EMA + Wilder-smoothed RSI. Rows within a batch
    are walked in (ts, event_id) order; the recurrence state lives in
    engine state, so across batches the walk equals the batch
    ``operators.recursive.recursive_indicators`` over the full ordered
    history — every float op is written in the identical IEEE order.
    ``alpha`` should be binary-exact for reproducibility."""
    a, p = float(alpha), int(period)

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        st = tuple(state.get) if state.exists else _INIT_REC_STATE
        for pdf in pdfs:
            st, out = _recursive_chunk_walk(st, pdf, a, p)
            yield out
        state.update(st)

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            RECURSIVE_OUTPUT_SCHEMA,
            RECURSIVE_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


EMA_OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, value double, ema double"
)
EMA_STATE_SCHEMA = "ema double"


def streaming_ema(events: DataFrame, alpha: float = 0.125) -> DataFrame:
    """Per-key streaming EMA alone — kept as its own single-field walk
    (1 state field, no gain/loss arithmetic) rather than a projection of
    :func:`streaming_recursive_indicators`: an EMA-only topic should not
    pay 7 checkpointed state fields and the Wilder branch per row for a
    column it drops. Same ordered-walk contract; value-equal to the
    batch ``ema`` (tested)."""
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


def has_transform_with_state(spark=None) -> bool:
    """True when the Spark-4 ``transformWithStateInPandas`` path can
    actually RUN here: the API shipped with pyspark 4.x, but its Python
    state-server protocol needs ``google.protobuf`` in the worker —
    absent in this container (verified r5, re-verified r6), so the
    capability probe is the protobuf import, not the API surface."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        return False


def streaming_recursive_indicators_tws(
    events: DataFrame, alpha: float = 0.125, period: int = 14
) -> DataFrame:
    """The ``transformWithStateInPandas`` twin of
    :func:`streaming_recursive_indicators` — same per-key recurrence
    walk, same state tuple, same IEEE op order, carried in a
    ``ValueState`` under Spark 4's successor state API (richer state
    types, timers, RocksDB-native layout). The recurrence is a pure
    function of (state tuple, ordered rows), so this is the mechanical
    port the applyInPandasWithState docstring promised; per-chunk
    ordering behavior mirrors the sibling exactly so the two APIs are
    bitwise-interchangeable.

    Gate with :func:`has_transform_with_state` before starting a query:
    building the plan works anywhere, but execution needs the
    ``google.protobuf`` worker dependency (the equivalence test skips
    with that reason when absent)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    a, p = float(alpha), int(period)

    class _RecursiveIndicators(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("rec", RECURSIVE_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            stored = self._state.get() if self._state.exists() else None
            st = tuple(stored) if stored is not None else _INIT_REC_STATE
            for pdf in rows:
                st, out = _recursive_chunk_walk(st, pdf, a, p)
                yield out
            self._state.update(st)

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            _RecursiveIndicators(),
            RECURSIVE_OUTPUT_SCHEMA,
            "append",
            "None",
        )
    )
